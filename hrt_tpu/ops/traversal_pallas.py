"""Pallas packet BVH traversal — the TPU replacement for GPU RT cores.

Strategy (the "ray packet" classic, re-tuned for the VPU): each grid
step owns a tile of TILE=1024 rays held as (8, 128) component planes in
vector registers.  The whole tile walks the skip-link flat BVH
(lbvh.FlatBVH) together with ONE scalar cursor:

  - node fetch = dynamic row slice of a (rows, 128) VMEM array + lane
    extraction via a one-hot reduction — no gathers, no DMA per node;
  - the node AABB is slab-tested against all 1024 rays in one shot on
    the VPU (~20 ops on (8,128) registers per node);
  - any-ray-hit on an internal node descends (cursor+1), otherwise the
    cursor jumps the subtree (skip link) — strictly monotonic walk;
  - leaves are K contiguous triangles: K Moller-Trumbore evaluations,
    each against all 1024 rays.

Divergence is paid as wasted lanes inside a tile instead of masked-off
SIMT threads; the wavefront pipeline sorts rays into coherent tiles to
keep that waste low (ops/wavefront.py).

Hardware analogue in the reference: TraceRay closest-hit/any-hit modes
(shaders/raytracing.slang:67,121) incl. ACCEPT_FIRST_HIT_AND_END_SEARCH
for shadows (early exit when every lane is occluded).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Tunables (env-overridable for benchmarking sweeps):
# rays per tile = TILE_ROWS * 128 — bigger amortizes the serial
# per-node scalar work over more rays, smaller cuts packet divergence.
TILE_ROWS = int(os.environ.get("HRT_TILE_ROWS", "64"))
TILE_LANES = 128
# Independent tile walks per kernel instance: the walks' serial
# fetch->reduce->branch chains are data-independent, letting the VLIW
# scheduler overlap one walk's latency with another's vector math.
WALKS = int(os.environ.get("HRT_WALKS", "1"))
TILE = TILE_ROWS * TILE_LANES
BLOCK_ROWS = TILE_ROWS * WALKS

# Per-call walk-tile rows override for the wide8 kernel (0 = TILE_ROWS).
# Smaller independent walks win on INCOHERENT ray batches (sorted 1080p
# bounce wavefronts: the 64-ray union walk saturates the tree, so the
# per-visit vector node tests dominate — scripts/rows_ab.py numbers);
# trace_paths scopes bounce-depth traces with `walk_rows(...)`.
_CALL_ROWS = 0


from contextlib import contextmanager


@contextmanager
def walk_rows(rows: int):
    """Trace-time context: wide8 traces inside use `rows`-row walk
    tiles (8/16/32; 0 restores the TILE_ROWS default)."""
    global _CALL_ROWS
    prev = _CALL_ROWS
    _CALL_ROWS = rows
    try:
        yield
    finally:
        _CALL_ROWS = prev
# Leaf-loop unroll factor: higher = faster steady-state (16 = full
# unroll at the default leaf size, measured +7-8% over 4), slower
# Mosaic compile — the persistent compilation cache amortizes it.
LEAF_UNROLL = int(os.environ.get("HRT_LEAF_UNROLL", "16"))
# Emit per-tile (visits, leaf_visits) counters (perf instrumentation).
DEBUG_COUNTERS = bool(int(os.environ.get("HRT_DEBUG_COUNTERS", "0")))
# Perf-decomposition probes (WRONG RESULTS — instrumentation only):
# "noleaf" skips all leaf processing (isolates node-machinery cost per
# visit); "allleaf" runs the Moller loop unconditionally every visit
# (upper bound; validates that the leaf cond actually skips work);
# "scan"/"scan_nofetch"/"shortchain" decompose the per-visit serial
# dependency stall (ROADMAP round-2 campaign: the classic walk pays
# ~0.95 us/visit of scalar-core stall on the slab+reduce chain that
# produces the next cursor; a data-independent next runs at 0.38).
# The losing responses to that number — FRUSTUM interval walks, PIPE2
# software pipelining, SPEC dual prefetch, OCT octant tables,
# GROUP_LEAF per-group Moller conds — were culled after the wide8
# kernel landed (round-3; measurements preserved in ROADMAP/DESIGN).
PROBE = os.environ.get("HRT_PROBE", "")
# Sublane-record BVH8 walk (ops/traversal_wide8.py): ONE row fetch +
# ONE roll exposes all 8 children; ONE packed crossing decides 8
# subtrees (vs 1 crossing per 1-2 binary decisions here) — the round-3
# kernel from the transfer-occupancy model, the measured winner on
# both closest and shadow passes.  Used whenever the accel carries a
# wide8 table (lbvh.attach_wide8); this binary kernel remains the
# fallback for trees past the wide8 id-packing/VMEM bounds (it can
# stream nodes from HBM).
WIDE8 = bool(int(os.environ.get("HRT_WIDE8", "1")))
# np (not jnp) scalar: a module-level jnp constant would initialize
# the backend at import time, breaking farm workers that must call
# jax.distributed.initialize first (see parallel/farm.py).
INF = np.float32(1e32)
# VMEM budgets (f32 words).  Small scenes keep node + triangle tables
# resident in VMEM; larger ones keep only nodes resident and DMA leaf
# triangle blocks from HBM on demand; beyond the node budget the node
# table ALSO stays in HBM and rows are streamed through a per-walk
# one-row VMEM cache (the skip-link walk visits strictly increasing
# node ids, so row reuse is high) — every scene size stays on the
# packet kernel.
MAX_VMEM_F32 = int(os.environ.get("HRT_MAX_VMEM_F32", "3000000"))
MAX_NODE_F32 = int(os.environ.get("HRT_MAX_NODE_F32", "2500000"))


def available() -> bool:
    return True


def _lane_scalar(row, lane):
    """Extract lane `lane` (traced) of a (1, 128) row as a scalar."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_LANES), 1)
    return jnp.sum(jnp.where(idx == lane, row, 0))


def _record_extract(rec, lane):
    """All sublane components of a record row at `lane` in ONE
    sublane-parallel masked lane-reduction: (1, C, 128) -> (1, C, 1).
    The VPU reduces every sublane simultaneously, so this costs the
    same as one per-component reduce — the single biggest win in the
    per-visit fixed cost (9 reductions -> 1)."""
    mask = jax.lax.broadcasted_iota(jnp.int32, rec.shape, 2) == lane
    return jnp.sum(jnp.where(mask, rec, 0.0), axis=2, keepdims=True)


def _node_decode(rec, cur):
    """Decode one node from its already-loaded row: ONE f32 reduce for
    the box + ONE i32 reduce for the two bit-carried controls (bitcast
    BEFORE reducing — summing the raw bits as f32 would flush
    small-integer denormal patterns to zero).

    leaf_code and skip are returned as (1, 1) VECTORS, not scalars:
    each vector->scalar crossing is a serialized ~300-cycle round trip
    on the fetch->decide chain, and the probe decomposition showed the
    node machinery (not leaf math) dominating the kernel at ~1.3
    us/visit.  step_walk packs the whole next-cursor decision into ONE
    scalar crossing instead of three."""
    lane = cur % TILE_LANES
    r = _record_extract(rec, lane)                    # (1, 8, 1)
    box = [r[:, c, :] for c in range(6)]
    mask = jax.lax.broadcasted_iota(jnp.int32, (1, 2, TILE_LANES),
                                    2) == lane
    meta = jnp.sum(jnp.where(mask, pltpu.bitcast(rec[:, 6:8, :],
                                                 jnp.int32), 0),
                   axis=2, keepdims=True)             # (1, 2, 1)
    leaf_v = meta[:, 0, :]                            # (1, 1)
    skip_v = meta[:, 1, :]                            # (1, 1)
    return box, leaf_v, skip_v


def _row_fetcher(nodes_ref, m_real):
    """Returns fetch(cur) -> (1, 8, 128) record row of node `cur`
    (index clamped the same way _node_decode clamps, so row and lane
    stay consistent)."""

    def fetch(cur):
        row = jnp.minimum(cur, m_real - 1) // TILE_LANES
        return nodes_ref[pl.ds(row, 1)]

    return fetch


def _row_fetcher_stream(nodes_ref, m_real, g, scratch, sems, cache):
    """fetch(cur) for the node-streaming (big-scene) mode: the node
    table lives in HBM; walk g holds ONE row (128 nodes) in a VMEM
    cache slot and DMAs on row change.  The skip-link walk visits
    strictly increasing node ids, so most visits hit the cached row.
    cache (SMEM, per walk) holds the resident row id, -1 = empty."""

    def fetch(cur):
        row = jnp.minimum(cur, m_real - 1) // TILE_LANES

        @pl.when(row != cache[g])
        def _():
            dma = pltpu.make_async_copy(
                nodes_ref.at[pl.ds(row, 1)],
                scratch.at[pl.ds(g, 1)], sems.at[g])
            dma.start()
            dma.wait()
            cache[g] = row

        return scratch[pl.ds(g, 1)]

    return fetch


def _leaf_fetch(tris_ref, start, scratch=None, sem=None):
    """Load the row holding one leaf's K-triangle block (K | 128, so a
    block never straddles a row).  With scratch/sem, the table lives in
    HBM and the row is DMA'd (big-scene mode)."""
    row = start // TILE_LANES
    if scratch is None:
        return tris_ref[pl.ds(row, 1)]                # (1, 16, 128)
    dma = pltpu.make_async_copy(tris_ref.at[pl.ds(row, 1)], scratch, sem)
    dma.start()
    dma.wait()
    return scratch[:]


def _tri_vecs(rec, lane):
    """Triangle values at `lane` (traced) as (1,1) vectors — one
    sublane-parallel reduce for all 9 components."""
    r = _record_extract(rec, lane)                    # (1, 16, 1)
    return [r[:, c, :] for c in range(9)]


def _slab_test(box, oix, oiy, oiz, ix, iy, iz, t_min, t_limit):
    """AABB slab test of one scalar box against the whole ray tile.

    Takes precomputed oi* = o*inv_d so each plane distance is a single
    FMA: t = bmin*inv_d - o*inv_d."""
    bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = box
    tx0 = bminx * ix - oix
    tx1 = bmaxx * ix - oix
    ty0 = bminy * iy - oiy
    ty1 = bmaxy * iy - oiy
    tz0 = bminz * iz - oiz
    tz1 = bmaxz * iz - oiz
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
    return jnp.maximum(t_near, t_min) <= jnp.minimum(t_far, t_limit)


def _moller(tri, ox, oy, oz, dx, dy, dz, t_min, t_limit):
    """One scalar triangle vs the ray tile. Returns (hit, t, u, v)."""
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tri
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t > t_min) & (t < t_limit))
    return hit, t, u, v


def _make_kernel(m_real: int, leaf_size: int, t_min: float,
                 find_closest: bool, walks: int = WALKS,
                 tris_in_vmem: bool = True,
                 nodes_in_vmem: bool = True):
    rows = TILE_ROWS

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, tris_ref,
               t_ref, tri_ref, u_ref, v_ref, *rest):
        if DEBUG_COUNTERS:
            cnt_ref, *rest = rest
        rest = list(rest)
        scratch = [rest.pop(0), rest.pop(0)] if not tris_in_vmem else []
        if not nodes_in_vmem:
            node_buf, node_sems, node_cache = rest
        tiny = jnp.float32(1e-20)
        tmin = jnp.float32(t_min)

        def inv(c):
            safe = jnp.where(jnp.abs(c) < tiny,
                             jnp.where(c < 0, -tiny, tiny), c)
            return 1.0 / safe

        # Per-walk ray planes (static row slices of the block) + the
        # walk's node-row fetcher.
        rays = []
        fetchers = []
        for g in range(walks):
            s = slice(g * rows, (g + 1) * rows)
            ox, oy, oz = ox_ref[s, :], oy_ref[s, :], oz_ref[s, :]
            dx, dy, dz = dx_ref[s, :], dy_ref[s, :], dz_ref[s, :]
            ix, iy, iz = inv(dx), inv(dy), inv(dz)
            rays.append((ox * ix, oy * iy, oz * iz, ix, iy, iz,
                         ox, oy, oz, dx, dy, dz))
            if PROBE == "scan_nofetch":
                fetchers.append(lambda cur: nodes_ref[0:1])
            elif nodes_in_vmem:
                fetchers.append(_row_fetcher(nodes_ref, m_real))
            else:
                node_cache[g] = jnp.int32(-1)  # empty cache slot
                fetchers.append(_row_fetcher_stream(
                    nodes_ref, m_real, g, node_buf, node_sems,
                    node_cache))

        def walk_state(g):
            s = slice(g * rows, (g + 1) * rows)
            return (jnp.int32(0), tmax_ref[s, :],
                    jnp.full((rows, TILE_LANES), -1, jnp.int32),
                    jnp.zeros((rows, TILE_LANES), jnp.float32),
                    jnp.zeros((rows, TILE_LANES), jnp.float32),
                    jnp.int32(0), jnp.int32(0),  # visit/leaf counters
                    jnp.zeros((), bool))         # all-occluded (shadow)

        def walk_active(st):
            cur = st[0]
            if find_closest:
                return cur < m_real
            # shadow mode: stop early once every lane is occluded.
            # The flag is refreshed only inside leaf processing (the
            # only place best_i changes) — a carried scalar instead of
            # a full-tile reduction every iteration.
            return (cur < m_real) & jnp.logical_not(st[7])

        def cond(states):
            alive = walk_active(states[0])
            for g in range(1, walks):
                alive = alive | walk_active(states[g])
            return alive

        def step_walk(st, ray, fetch):
            cur, best_t, best_i, bu, bv, n_vis, n_leaf, done = st
            active = walk_active(st)
            oix, oiy, oiz, ix, iy, iz, ox, oy, oz, dx, dy, dz = ray
            box, leaf_v, skip_v = _node_decode(
                fetch(cur), jnp.minimum(cur, m_real - 1))
            hit = _slab_test(box, oix, oiy, oiz, ix, iy, iz, tmin,
                             best_t)
            # The whole next-cursor decision stays in vector registers
            # and crosses to the scalar core ONCE, packed as
            # p = next_node * 2 + take_leaf (vector->scalar moves are
            # ~300-cycle serialized round trips; this was 3 of them).
            any_v = jnp.any(hit, axis=(0, 1), keepdims=True)   # (1, 1)
            is_leaf_v = leaf_v > 0
            descend_v = any_v & jnp.logical_not(is_leaf_v)
            nxt_v = jnp.where(descend_v, cur + 1, skip_v)
            p = jnp.sum(nxt_v * 2
                        + (any_v & is_leaf_v).astype(jnp.int32))
            take_leaf = active & ((p & 1) == 1)
            nxt = p >> 1
            if PROBE.startswith("scan"):
                # Control flow made data-INDEPENDENT: visit every node
                # sequentially (p stays live via the counter so the
                # body's vector work + crossing aren't dead-coded).
                nxt = cur + 1
                n_leaf = n_leaf + (p & 1)
            elif PROBE == "shortchain":
                # Dependent control, but through a SHORT vector chain
                # (meta decode only — no slab/any on the critical
                # path): descend internals, jump leaves.  Isolates the
                # pipeline-depth stall from the transfer cost itself.
                p2 = jnp.sum(jnp.where(is_leaf_v, skip_v, cur + 1))
                nxt = p2
                n_leaf = n_leaf + (p & 1)  # keep full body live

            def do_leaf(args):
                best_t, best_i, bu, bv, done = args
                # The leaf start pays its own scalar crossing, but only
                # on the taken branch (~1 in 5 visits).  max() guards
                # the "allleaf" probe (internal nodes carry leaf_code 0
                # -> start would go negative); no-op on the normal path
                # where the cond guarantees leaf_code > 0.
                start = jnp.maximum(jnp.sum(leaf_v) - 1, 0)
                lane0 = start % TILE_LANES

                if tris_in_vmem:
                    rec = _leaf_fetch(tris_ref, start)
                else:
                    rec = _leaf_fetch(tris_ref, start, scratch[0],
                                      scratch[1])

                # Partial unroll inside a rolled loop: full unrolling
                # blows up Mosaic compile time, fully rolled costs
                # ~16% runtime (see LEAF_UNROLL).
                unroll = min(LEAF_UNROLL, leaf_size)
                while leaf_size % unroll:
                    unroll -= 1

                def tri_loop(gox, goy, goz, gdx, gdy, gdz, state):
                    def tri_body(gk, args):
                        best_t, best_i, bu, bv = args
                        for kk in range(unroll):
                            k = gk * unroll + kk
                            tri = _tri_vecs(rec, lane0 + k)
                            h, t, u, v = _moller(tri, gox, goy, goz,
                                                 gdx, gdy, gdz,
                                                 tmin, best_t)
                            best_i = jnp.where(h, start + k, best_i)
                            if find_closest:
                                bu = jnp.where(h, u, bu)
                                bv = jnp.where(h, v, bv)
                                best_t = jnp.where(h, t, best_t)
                        return best_t, best_i, bu, bv

                    return jax.lax.fori_loop(0, leaf_size // unroll,
                                             tri_body, state)

                best_t, best_i, bu, bv = tri_loop(
                    ox, oy, oz, dx, dy, dz, (best_t, best_i, bu, bv))
                if not find_closest:
                    # Shadow mode: retire occluded lanes (t_limit = -1
                    # fails every slab test) so the packet stops
                    # descending into nodes only already-occluded lanes
                    # would enter — the per-lane
                    # ACCEPT_FIRST_HIT_AND_END_SEARCH analogue
                    # (ref: raytracing.slang:67) — and refresh the
                    # all-occluded early-exit flag.
                    occ = best_i >= 0
                    best_t = jnp.where(occ, jnp.float32(-1.0), best_t)
                    done = jnp.all(occ)
                return best_t, best_i, bu, bv, done

            if PROBE in ("noleaf", "scan", "scan_nofetch", "shortchain"):
                pass
            elif PROBE == "allleaf":
                best_t, best_i, bu, bv, done = do_leaf(
                    (best_t, best_i, bu, bv, done))
            else:
                best_t, best_i, bu, bv, done = jax.lax.cond(
                    take_leaf, do_leaf, lambda a: a,
                    (best_t, best_i, bu, bv, done))

            n_vis = n_vis + active.astype(jnp.int32)
            if DEBUG_COUNTERS:
                # Leaf counter packs 1024*leaves + group-hits (groups =
                # (8,128) row blocks whose slab mask hit — the work
                # GROUP_LEAF would run).  Visits live in their own
                # output row (see the writeback), so nothing overflows
                # until 2^21 leaf visits per tile.
                gh = jnp.int32(0)
                if rows % 8 == 0:
                    for g in range(rows // 8):
                        gh = gh + jnp.any(
                            hit[8 * g:8 * (g + 1)]).astype(jnp.int32)
                n_leaf = n_leaf + jnp.where(take_leaf, 1024 + gh, 0)
            else:
                n_leaf = n_leaf + take_leaf.astype(jnp.int32)
            cur = jnp.where(active, nxt, cur)
            return cur, best_t, best_i, bu, bv, n_vis, n_leaf, done

        def body(states):
            return tuple(step_walk(states[g], rays[g], fetchers[g])
                         for g in range(walks))

        states = tuple(walk_state(g) for g in range(walks))
        states = jax.lax.while_loop(cond, body, states)
        for g in range(walks):
            s = slice(g * rows, (g + 1) * rows)
            _, best_t, best_i, bu, bv, n_vis, n_leaf = states[g][:7]
            t_ref[s, :] = best_t
            tri_ref[s, :] = best_i
            u_ref[s, :] = bu
            v_ref[s, :] = bv
            if DEBUG_COUNTERS:
                # Row 0 = visits, row 1 = 1024*leaves + group-hits —
                # separate rows instead of bit-packing one word (leaf
                # counts of hundreds per tile overflowed 16 bits).
                riota = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, TILE_LANES), 0)
                cnt_ref[s, :] = jnp.where(
                    riota == 0, n_vis,
                    jnp.where(riota == 1, n_leaf, 0))

    return kernel




@functools.partial(jax.jit,
                   static_argnames=("m_real", "leaf_size", "t_min",
                                    "find_closest"))
def _trace_tiles(ox, oy, oz, dx, dy, dz, tmax, flat_nodes,
                 flat_tris, m_real: int, leaf_size: int, t_min: float,
                 find_closest: bool):
    """Run the packet kernel over all ray tiles.

    Ray components are (R, 128) with R a multiple of 8; tile i owns rows
    [8i, 8i+8).  Returns (t, tri, u, v) in the same layout."""
    rows = ox.shape[0]
    n_tiles = rows // BLOCK_ROWS
    nodes_in_vmem = flat_nodes.size <= MAX_NODE_F32
    tris_in_vmem = ((flat_nodes.size if nodes_in_vmem else 0)
                    + flat_tris.size) <= MAX_VMEM_F32
    kernel = _make_kernel(m_real, leaf_size, t_min, find_closest,
                          tris_in_vmem=tris_in_vmem,
                          nodes_in_vmem=nodes_in_vmem)

    ray_spec = pl.BlockSpec((BLOCK_ROWS, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    node_spec = vmem_spec if nodes_in_vmem else any_spec
    tri_spec = vmem_spec if tris_in_vmem else any_spec
    scratch_shapes = [] if tris_in_vmem else [
        pltpu.VMEM((1, 16, TILE_LANES), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if not nodes_in_vmem:
        scratch_shapes += [
            pltpu.VMEM((WALKS, 8, TILE_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((WALKS,)),
            pltpu.SMEM((WALKS,), jnp.int32),
        ]
    n_out = 5 if DEBUG_COUNTERS else 4
    out_shape = [
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
    ]
    if DEBUG_COUNTERS:
        out_shape.append(
            jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 7 + [node_spec, tri_spec],
        out_specs=[ray_spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(jax.default_backend() == "cpu"),
    )(ox, oy, oz, dx, dy, dz, tmax, flat_nodes, flat_tris)
    # With DEBUG_COUNTERS a 5th output packs (visits << 16 | leaves)
    # per walk (see scripts/kernel_stats.py); callers unpack [:4].
    return tuple(out)


def _to_tiles(x: jnp.ndarray, n_pad: int, fill=0.0):
    x = jnp.pad(x, (0, n_pad - x.shape[0]), constant_values=fill)
    return x.reshape(-1, TILE_LANES)


def use_wide8(accel) -> bool:
    """True when this accel routes to the sublane-record BVH8 kernel
    (ops/traversal_wide8.py) instead of the binary packet walk.

    Off on the CPU backend (interpret-mode wide8 is very slow — the
    dedicated tests opt in with HRT_WIDE8_CPU=1, read dynamically)."""
    if jax.default_backend() == "cpu" and not bool(
            int(os.environ.get("HRT_WIDE8_CPU", "0"))):
        return False
    return (WIDE8 and getattr(accel, "w8", None) is not None
            and WALKS == 1 and TILE_ROWS % 8 == 0
            and 1 <= TILE_ROWS // 8 <= 8 and PROBE == "")


def _run_planes(scene, accel, ox, oy, oz, dx, dy, dz, t_min, t_max,
                find_closest: bool):
    """Planar core: ray components as (N,) planes — reshaping a linear
    plane into (rows, 128) tiles is free, so the kernel boundary costs
    no layout copies (see ops/v3.py)."""
    flat = accel.flat
    n = ox.shape[0]
    wide8 = use_wide8(accel)
    quantum = (TILE_ROWS if wide8 else BLOCK_ROWS) * TILE_LANES
    n_pad = ((n + quantum - 1) // quantum) * quantum
    nl = accel.tree.child_l.shape[0] + 1
    m_real = 2 * nl - 1
    leaf_size = accel.leaf_size

    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    comps = [_to_tiles(ox, n_pad), _to_tiles(oy, n_pad),
             _to_tiles(oz, n_pad), _to_tiles(dx, n_pad),
             _to_tiles(dy, n_pad), _to_tiles(dz, n_pad),
             _to_tiles(tmax, n_pad, fill=-1.0)]  # padded rays hit nothing
    if wide8:
        from . import traversal_wide8

        t, tri, u, v = traversal_wide8.trace_tiles_wide8(
            *comps, accel.w8, flat.tris,
            nw=accel.w8.shape[0] * 16, leaf_size=leaf_size,
            t_min=float(t_min), find_closest=find_closest,
            leaf_base=accel.w8_lb, rows=_CALL_ROWS)[:4]
    else:
        t, tri, u, v = _trace_tiles(
            *comps, flat.nodes, flat.tris,
            m_real=m_real, leaf_size=leaf_size, t_min=float(t_min),
            find_closest=find_closest)[:4]
    flat_out = lambda a: a.reshape(-1)[:n]
    return flat_out(t), flat_out(tri), flat_out(u), flat_out(v)


def _run(scene, accel, o, d, t_min, t_max, find_closest: bool):
    return _run_planes(scene, accel, o[:, 0], o[:, 1], o[:, 2],
                       d[:, 0], d[:, 1], d[:, 2], t_min, t_max,
                       find_closest)


def closest_hit_p(scene, accel, o, d, t_min, t_max,
                  sorted_ids: bool = False):
    """Planar closest_hit: o/d are V3s of (N,) planes (ops/v3.py)."""
    t, tri_sorted, u, v = _run_planes(scene, accel, o.x, o.y, o.z,
                                      d.x, d.y, d.z, t_min, t_max, True)
    if sorted_ids:
        return t, tri_sorted, u, v
    tri = jnp.where(tri_sorted >= 0,
                    accel.tree.tri_perm[jnp.maximum(tri_sorted, 0)], -1)
    return t, tri, u, v


def any_hit_p(scene, accel, o, d, t_min, t_max):
    """Planar occlusion query (V3 in, bool (N,) out)."""
    _, tri_sorted, _, _ = _run_planes(scene, accel, o.x, o.y, o.z,
                                      d.x, d.y, d.z, t_min, t_max,
                                      False)
    return tri_sorted >= 0


def closest_hit(scene, accel, o, d, t_min, t_max, sorted_ids: bool = False):
    """(t, tri_id, u, v) — signature of renderer.trace_closest.

    sorted_ids=True returns leaf-pool (BVH-sorted) triangle ids and
    skips the tri_perm remap gather — pair with Accel.attr shading."""
    t, tri_sorted, u, v = _run(scene, accel, o, d, t_min, t_max, True)
    if sorted_ids:
        return t, tri_sorted, u, v
    tri = jnp.where(tri_sorted >= 0,
                    accel.tree.tri_perm[jnp.maximum(tri_sorted, 0)], -1)
    return t, tri, u, v


def any_hit(scene, accel, o, d, t_min, t_max):
    """Occlusion query (shadow rays): bool (N,)."""
    _, tri_sorted, _, _ = _run(scene, accel, o, d, t_min, t_max, False)
    return tri_sorted >= 0
