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
# Leaf-loop unroll factor: higher = faster steady-state (16 = full
# unroll at the default leaf size, measured +7-8% over 4), slower
# Mosaic compile — the persistent compilation cache amortizes it.
LEAF_UNROLL = int(os.environ.get("HRT_LEAF_UNROLL", "16"))
# Emit per-tile (visits, leaf_visits) counters (perf instrumentation).
DEBUG_COUNTERS = bool(int(os.environ.get("HRT_DEBUG_COUNTERS", "0")))
# Speculative successor prefetch: fetch BOTH candidate next rows
# (cur+1 and skip) while the current node's slab/leaf math runs, then
# select by the descend bit — takes the node fetch off the serial
# fetch->decide chain at the cost of one extra row load per visit.
# Measured flat on v5e (the walk is throughput-bound, not
# latency-bound); kept as an opt-in experiment.
SPEC = bool(int(os.environ.get("HRT_SPEC", "0")))
# Group-predicated leaf phase: per leaf visit, split the tile into
# row groups of (8, 128) rays and run the K-triangle Moller loop ONLY
# on groups whose slab mask has any hit.  Leaf math dominates kernel
# vector work (~90% of issues) and a leaf's AABB covers few groups of
# a coherent tile, so skipped groups are pure savings (a scalar any()
# + branch per group).
GROUP_LEAF = bool(int(os.environ.get("HRT_GROUP_LEAF", "0")))
# Perf-decomposition probes (WRONG RESULTS — instrumentation only):
# "noleaf" skips all leaf processing (isolates node-machinery cost per
# visit); "allleaf" runs the Moller loop unconditionally every visit
# (upper bound; validates that the leaf cond actually skips work);
# "scan"/"scan_nofetch"/"shortchain" decompose the per-visit serial
# dependency stall (see _make_kernel_frustum's docstring for the
# measured numbers that motivated the frustum walk).
PROBE = os.environ.get("HRT_PROBE", "")
# Frustum-interval walk (see _make_kernel_frustum): traversal decisions
# from conservative per-group interval arithmetic instead of per-ray
# slab tests — keeps the fetch->decide dependency chain SHALLOW (the
# measured wall: a deep per-ray slab+reduce chain stalls the scalar
# core ~0.95 us per visit; the same body with a short chain runs at
# 0.38 us/visit).  Exact: the interval test over-approximates the
# per-ray any(), and leaves run exact per-ray Moller tests.
FRUSTUM = bool(int(os.environ.get("HRT_FRUSTUM", "0")))
# Software-pipelined 2-node walk (see _make_kernel_pipe2): decide two
# nodes per iteration from prefetched candidate records; only a short
# fetch->meta->crossing chain stays serial.
PIPE2 = bool(int(os.environ.get("HRT_PIPE2", "0")))
# Sublane-record BVH8 walk (ops/traversal_wide8.py): ONE row fetch +
# ONE roll exposes all 8 children; ONE packed crossing decides 8
# subtrees (vs 1 crossing per 1-2 binary decisions here) — the round-3
# kernel from the transfer-occupancy model.  Used when the accel
# carries a wide8 table (lbvh.attach_wide8) unless disabled.
WIDE8 = bool(int(os.environ.get("HRT_WIDE8", "1")))
# Octant-ordered traversal: when the accel carries the 8 near-first
# DFS tables (FlatBVH.nodes_oct), each walk picks the table matching
# its first ray's direction octant.  MEASURED NO WIN on the bench
# scenes (packet visits are set by the tile frustum, not visit order:
# 71.2 -> 72.5 visits/tile) — opt-in for depth-complex scenes.
OCT = bool(int(os.environ.get("HRT_OCT", "0")))
INF = jnp.float32(1e32)
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


def _tris_fit_vmem(flat) -> bool:
    return flat.nodes.size + flat.tris.size <= MAX_VMEM_F32


def _vmem_ok(flat) -> bool:
    """True when the node table is VMEM-resident (not streamed).  No
    longer gates a fallback here (nodes stream from HBM past the
    budget); still used by traversal_wide's VMEM-only kernel."""
    return flat.nodes.size <= MAX_NODE_F32


def _lane_scalar(row, lane):
    """Extract lane `lane` (traced) of a (1, 128) row as a scalar."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_LANES), 1)
    return jnp.sum(jnp.where(idx == lane, row, 0))


def _lane_vec(row, lane):
    """Extract a lane as a (1, 1) VECTOR via a masked reduce.

    Measured fastest on v5e: reduce-produced (1,1) values broadcast
    against the ray planes for free, while sliced (1,1) values hit
    Mosaic's 'broadcast in both sublanes and lanes' limitation and
    true scalars pay a vreg->sreg move each (tried both; slower)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_LANES), 1)
    return jnp.sum(jnp.where(idx == lane, row, 0), axis=-1, keepdims=True)


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


def _row_fetcher(nodes_ref, m_real, oct=None):
    """Returns fetch(cur) -> (1, 8, 128) record row of node `cur`
    (index clamped the same way _node_decode clamps, so row and lane
    stay consistent).  With `oct`, indexes the (8, rows, 8, 128)
    octant-ordered table stack."""

    def fetch(cur):
        row = jnp.minimum(cur, m_real - 1) // TILE_LANES
        if oct is None:
            return nodes_ref[pl.ds(row, 1)]
        return nodes_ref[oct, pl.ds(row, 1)]

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


def _leaf_align(rec, start):
    """Rotate a leaf record row so the leaf's K-triangle block starts
    at lane 0 — ONE dynamic lane roll, after which each triangle is a
    FREE static slice (vs. a ~60-100 cycle masked reduce per triangle;
    16 of those dominated the leaf phase)."""
    shift = (TILE_LANES - start % TILE_LANES) % TILE_LANES
    return pltpu.roll(rec, shift, axis=2)


def _tri_vecs_static(rec_aligned, k: int):
    """Triangle k's values from an aligned record row: static lane
    slices, no reduces.  Returned as (1, 128) lane-broadcasts — Mosaic
    can't broadcast a sliced (1,1) in sublanes AND lanes at once
    ("Not implemented"), but lane-only here + implicit sublane
    broadcast at the consuming elementwise op are both supported."""
    r = rec_aligned[:, :, k:k + 1]                    # (1, 16, 1)
    # pltpu.repeat pins the (1,1)->(1,128) lane broadcast as a REAL
    # Mosaic op — jnp.broadcast_to gets folded by XLA into a single
    # (1,1)->(8,128) both-axes broadcast Mosaic can't lower, and
    # lax.optimization_barrier has no Pallas lowering (both tried).
    return [pltpu.repeat(r[:, c, :], TILE_LANES, axis=1)
            for c in range(9)]


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
                 tris_in_vmem: bool = True, octant: bool = False,
                 nodes_in_vmem: bool = True):
    rows = TILE_ROWS
    assert nodes_in_vmem or not octant, \
        "octant tables are VMEM-budget-gated at build time"
    # Speculative dual-fetch would thrash the one-row stream cache.
    spec = SPEC and nodes_in_vmem

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
        # walk's node-row fetcher (octant mode: table picked by the
        # first ray's direction octant — packets are coherent, so one
        # representative is enough; a wrong pick only costs order).
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
            elif octant:
                oct = ((_lane_scalar(dx[0:1, :], 0) > 0)
                       .astype(jnp.int32)
                       + 2 * (_lane_scalar(dy[0:1, :], 0) > 0)
                       .astype(jnp.int32)
                       + 4 * (_lane_scalar(dz[0:1, :], 0) > 0)
                       .astype(jnp.int32))
                fetchers.append(_row_fetcher(nodes_ref, m_real, oct))
            elif nodes_in_vmem:
                fetchers.append(_row_fetcher(nodes_ref, m_real))
            else:
                node_cache[g] = jnp.int32(-1)  # empty cache slot
                fetchers.append(_row_fetcher_stream(
                    nodes_ref, m_real, g, node_buf, node_sems,
                    node_cache))

        def walk_state(g):
            s = slice(g * rows, (g + 1) * rows)
            st = (jnp.int32(0), tmax_ref[s, :],
                  jnp.full((rows, TILE_LANES), -1, jnp.int32),
                  jnp.zeros((rows, TILE_LANES), jnp.float32),
                  jnp.zeros((rows, TILE_LANES), jnp.float32),
                  jnp.int32(0), jnp.int32(0),  # visit/leaf counters
                  jnp.zeros((), bool))         # all-occluded (shadow)
            if spec:
                st = st + (fetchers[g](jnp.int32(0)),)
            return st

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
            if spec:
                (cur, best_t, best_i, bu, bv, n_vis, n_leaf, done,
                 rec) = st
            else:
                cur, best_t, best_i, bu, bv, n_vis, n_leaf, done = st
            active = walk_active(st)
            oix, oiy, oiz, ix, iy, iz, ox, oy, oz, dx, dy, dz = ray
            if spec:
                box, leaf_v, skip_v = _node_decode(
                    rec, jnp.minimum(cur, m_real - 1))
                # Prefetch BOTH successor rows now — they overlap with
                # the slab/leaf vector work below; the scalar decision
                # only selects between loaded registers.
                rec_n = fetch(cur + 1)
                rec_s = fetch(jnp.sum(skip_v))
            else:
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

                if GROUP_LEAF and rows % 8 == 0 and rows > 8:
                    outs = []
                    for g in range(rows // 8):
                        sl = slice(8 * g, 8 * (g + 1))
                        state_g = (best_t[sl], best_i[sl],
                                   bu[sl], bv[sl])

                        def run(a, sl=sl):
                            return tri_loop(ox[sl], oy[sl], oz[sl],
                                            dx[sl], dy[sl], dz[sl], a)

                        outs.append(jax.lax.cond(
                            jnp.any(hit[sl]), run, lambda a: a,
                            state_g))
                    cat = lambda i: jnp.concatenate(
                        [o[i] for o in outs], axis=0)
                    best_t, best_i, bu, bv = (cat(0), cat(1), cat(2),
                                              cat(3))
                else:
                    best_t, best_i, bu, bv = tri_loop(
                        ox, oy, oz, dx, dy, dz,
                        (best_t, best_i, bu, bv))
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
            if spec:
                # nxt == cur+1 <=> descend (when skip == cur+1 the two
                # candidate rows are identical, so either pick is right).
                rec_nxt = jnp.where(nxt == cur + 1, rec_n, rec_s)
                rec = jnp.where(active, rec_nxt, rec)
                cur = jnp.where(active, nxt, cur)
                return (cur, best_t, best_i, bu, bv, n_vis, n_leaf,
                        done, rec)
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


def _make_kernel_pipe2(m_real: int, leaf_size: int, t_min: float,
                       find_closest: bool, tris_in_vmem: bool = True):
    """Software-pipelined 2-node packet walk (HRT_PIPE2=1).

    The probe decomposition (see ROADMAP round-2 campaign) showed the
    classic walk pays ~0.95 us/visit of serial stall: the next fetch
    index waits on the full decode->slab->reduce chain.  Here each
    iteration decides TWO nodes — `cur` (record prefetched last
    iteration) and its chosen successor (records of BOTH candidates
    cur+1 and skip(cur) also prefetched, slab-tested speculatively,
    selected in vector registers) — and the only work left on the
    critical path is fetch(nxt2) -> meta extract -> skip crossing to
    start the next prefetches (the "shortchain" structure, measured
    0.38 us).  One wasted speculative slab per iteration is the price.

    Exactness: identical decisions to the classic walk, except the
    successor's slab test uses best_t as of iteration START (leaf hits
    of `cur` land after) — conservative only (may visit nodes the
    classic walk would cull), never skips a required node.  Leaves are
    processed in walk order with per-ray Moller tests as usual.
    """
    rows = TILE_ROWS

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, tris_ref, t_ref, tri_ref, u_ref, v_ref,
               *rest):
        if DEBUG_COUNTERS:
            cnt_ref, *rest = rest
        rest = list(rest)
        scratch = [rest.pop(0), rest.pop(0)] if not tris_in_vmem else []
        fetch = _row_fetcher(nodes_ref, m_real)
        tiny = jnp.float32(1e-20)
        tmin = jnp.float32(t_min)

        def inv(c):
            safe = jnp.where(jnp.abs(c) < tiny,
                             jnp.where(c < 0, -tiny, tiny), c)
            return 1.0 / safe

        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        oix, oiy, oiz = ox * ix, oy * iy, oz * iz

        def decode(rec, lane_v):
            """_node_decode with an explicit (possibly vector) lane."""
            r = _record_extract(rec, lane_v)
            box = [r[:, c, :] for c in range(6)]
            mask = jax.lax.broadcasted_iota(
                jnp.int32, (1, 2, TILE_LANES), 2) == lane_v
            meta = jnp.sum(jnp.where(mask,
                                     pltpu.bitcast(rec[:, 6:8, :],
                                                   jnp.int32), 0),
                           axis=2, keepdims=True)
            return box, meta[:, 0, :], meta[:, 1, :]

        def slab_any(box, best_t):
            """(1,1) int32 0/1 — i1-valued (1,1) selects downstream hit
            Mosaic's 'unsupported target bitwidth for truncation'."""
            hit = _slab_test(box, oix, oiy, oiz, ix, iy, iz, tmin,
                             best_t)
            return jnp.any(hit, axis=(0, 1),
                           keepdims=True).astype(jnp.int32)

        def do_leaf(leaf_vv, args):
            best_t, best_i, bu, bv, done = args
            start = jnp.maximum(jnp.sum(leaf_vv) - 1, 0)
            lane0 = start % TILE_LANES
            if tris_in_vmem:
                rec = _leaf_fetch(tris_ref, start)
            else:
                rec = _leaf_fetch(tris_ref, start, scratch[0],
                                  scratch[1])
            unroll = min(LEAF_UNROLL, leaf_size)
            while leaf_size % unroll:
                unroll -= 1

            def tri_body(gk, args):
                best_t, best_i, bu, bv = args
                for kk in range(unroll):
                    k = gk * unroll + kk
                    tri = _tri_vecs(rec, lane0 + k)
                    h, t, u, v = _moller(tri, ox, oy, oz, dx, dy, dz,
                                         tmin, best_t)
                    best_i = jnp.where(h, start + k, best_i)
                    if find_closest:
                        bu = jnp.where(h, u, bu)
                        bv = jnp.where(h, v, bv)
                        best_t = jnp.where(h, t, best_t)
                return best_t, best_i, bu, bv

            best_t, best_i, bu, bv = jax.lax.fori_loop(
                0, leaf_size // unroll, tri_body,
                (best_t, best_i, bu, bv))
            if not find_closest:
                occ = best_i >= 0
                best_t = jnp.where(occ, jnp.float32(-1.0), best_t)
                done = jnp.all(occ)
            return best_t, best_i, bu, bv, done

        def walk_active(st):
            cur = st[0]
            if find_closest:
                return cur < m_real
            return (cur < m_real) & jnp.logical_not(st[7])

        def step(st):
            # Single-walk kernel: the while cond guarantees the walk is
            # live inside the body, so no `active` gating (the classic
            # kernel needs it only for multi-walk lockstep).
            (cur, best_t, best_i, bu, bv, n_vis, n_leaf, done,
             R_cur, R_A, R_B, skipc) = st
            curc = jnp.minimum(cur, m_real - 1)

            # Decode all three prefetched records (B's lane comes from
            # cur's skip value, still in vector registers).
            boxC, leafC_v, skipC_v = decode(R_cur, curc % TILE_LANES)
            boxA, leafA_v, skipA_v = decode(
                R_A, jnp.minimum(cur + 1, m_real - 1) % TILE_LANES)
            # B's lane from the SCALAR skip carried since the
            # prefetch crossing (a vector lane would need a
            # (1,1)->(1,8,128) broadcast Mosaic can't lower).
            laneB = jnp.minimum(skipc, m_real - 1) % TILE_LANES
            boxB, leafB_v, skipB_v = decode(R_B, laneB)

            anyC = slab_any(boxC, best_t)
            anyA = slab_any(boxA, best_t)
            anyB = slab_any(boxB, best_t)

            isleafC = (leafC_v > 0).astype(jnp.int32)
            dC = (anyC * (1 - isleafC)) == 1        # bool predicate
            take1_i = anyC * isleafC
            nxt1_v = jnp.where(dC, cur + 1, skipC_v)

            any1 = jnp.where(dC, anyA, anyB)        # i32 select
            leaf1_v = jnp.where(dC, leafA_v, leafB_v)
            skip1_v = jnp.where(dC, skipA_v, skipB_v)
            valid1_i = (nxt1_v < m_real).astype(jnp.int32)
            isleaf1 = (leaf1_v > 0).astype(jnp.int32)
            d1 = (any1 * (1 - isleaf1) * valid1_i) == 1
            take2_i = any1 * isleaf1 * valid1_i
            nxt2_v = jnp.where(valid1_i == 1,
                               jnp.where(d1, nxt1_v + 1, skip1_v),
                               nxt1_v)

            # ONE packed crossing for both decisions.
            p = jnp.sum(nxt2_v * 8 + valid1_i * 4 + take2_i * 2
                        + take1_i)
            tl1 = (p & 1) == 1
            tl2 = (p & 2) == 2
            v1 = (p >> 2) & 1
            nxt2 = p >> 3

            best_t, best_i, bu, bv, done = jax.lax.cond(
                tl1, lambda a: do_leaf(leafC_v, a), lambda a: a,
                (best_t, best_i, bu, bv, done))
            best_t, best_i, bu, bv, done = jax.lax.cond(
                tl2, lambda a: do_leaf(leaf1_v, a), lambda a: a,
                (best_t, best_i, bu, bv, done))

            # Prefetch chain for the next iteration: fetch(nxt2), pull
            # only its skip (shortchain), then both candidates.
            R_curN = fetch(nxt2)
            nxtc = jnp.minimum(nxt2, m_real - 1)
            maskN = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, TILE_LANES), 2) == nxtc % TILE_LANES
            skipN = jnp.sum(jnp.where(
                maskN, pltpu.bitcast(R_curN[:, 7:8, :], jnp.int32), 0))
            R_AN = fetch(nxt2 + 1)
            R_BN = fetch(skipN)

            n_vis = n_vis + 1 + v1
            n_leaf = (n_leaf + tl1.astype(jnp.int32)
                      + tl2.astype(jnp.int32))
            return (nxt2, best_t, best_i, bu, bv, n_vis, n_leaf, done,
                    R_curN, R_AN, R_BN, skipN)

        # Prologue: prime the three-record pipeline for cur = 0.
        R0 = fetch(jnp.int32(0))
        mask0 = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, TILE_LANES), 2) == 0
        skip0 = jnp.sum(jnp.where(
            mask0, pltpu.bitcast(R0[:, 7:8, :], jnp.int32), 0))
        st = (jnp.int32(0), tmax_ref[:, :],
              jnp.full((rows, TILE_LANES), -1, jnp.int32),
              jnp.zeros((rows, TILE_LANES), jnp.float32),
              jnp.zeros((rows, TILE_LANES), jnp.float32),
              jnp.int32(0), jnp.int32(0), jnp.zeros((), bool),
              R0, fetch(jnp.int32(1)), fetch(skip0), skip0)
        st = jax.lax.while_loop(walk_active, step, st)
        _, best_t, best_i, bu, bv, n_vis, n_leaf = st[:7]
        t_ref[:, :] = best_t
        tri_ref[:, :] = best_i
        u_ref[:, :] = bu
        v_ref[:, :] = bv
        if DEBUG_COUNTERS:
            riota = jax.lax.broadcasted_iota(
                jnp.int32, (rows, TILE_LANES), 0)
            cnt_ref[:, :] = jnp.where(
                riota == 0, n_vis,
                jnp.where(riota == 1, n_leaf * 1024, 0))

    return kernel


def _make_kernel_frustum(m_real: int, leaf_size: int, t_min: float,
                         find_closest: bool, tris_in_vmem: bool = True,
                         nodes_in_vmem: bool = True):
    """Frustum-interval packet walk — same skip-link traversal, but the
    per-visit descend decision comes from CONSERVATIVE interval
    arithmetic over (1, ng) per-group ray bounds instead of a per-ray
    slab test, and per-ray hit state lives IN THE OUTPUT REFS (mutated
    in place under pl.when) instead of riding the while_loop carry.

    Why, in two measurements (scripts/kernel_stats.py probes):
    - "scan"/"shortchain" probes: the classic kernel's 1.33 us/visit is
      ~0.95 us of the scalar core stalling on the deep per-ray
      slab+reduce chain that produces the next cursor; the same body
      with a shallow decision chain runs at 0.38 us/visit.  So the
      decision here is ~45 tiny (1, ng) interval ops -> ONE packed
      vector->scalar crossing (cursor | per-group hit bits | leaf bit).
    - lax.cond with (64,128)-sized carried state costs ~0.5 us per
      taken branch (vreg spills): with hit state in refs, the leaf
      conds become plain pl.when branches over scalar BITS of the same
      crossing, and the loop carries only scalars.

    The expensive per-ray work (Moller) runs only at leaves and only
    for ray groups whose frustum bit is set — the block-swizzled ray
    order (ops/wavefront.to_walk_blocks) makes each (8, 128) group a
    compact 32x32 pixel block so those bits are selective.

    Exactness: the interval test over-approximates the per-ray any()
    (outer bounds of every ray's slab terms -> superset walk); hits
    come only from exact per-ray Moller tests.  Per-group t-culling
    (`tlim`, the group max of per-ray best_t, in a VMEM scratch row)
    refreshes after each processed leaf; a fully-occluded shadow group
    drops to tlim = -1 and auto-retires from every later frustum test.
    """
    rows = TILE_ROWS
    ng = rows // 8                    # (8, 128) ray groups per tile

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, tris_ref, t_ref, tri_ref, u_ref, v_ref,
               *rest):
        if DEBUG_COUNTERS:
            cnt_ref, *rest = rest
        rest = list(rest)
        scratch = [rest.pop(0), rest.pop(0)] if not tris_in_vmem else []
        if not nodes_in_vmem:
            node_buf, node_sems, node_cache = (rest.pop(0),
                                               rest.pop(0), rest.pop(0))
            node_cache[0] = jnp.int32(-1)
            fetch = _row_fetcher_stream(nodes_ref, m_real, 0, node_buf,
                                        node_sems, node_cache)
        else:
            fetch = _row_fetcher(nodes_ref, m_real)
        tlim_ref, done_ref = rest
        tiny = jnp.float32(1e-20)
        tmin = jnp.float32(t_min)

        def inv(c):
            safe = jnp.where(jnp.abs(c) < tiny,
                             jnp.where(c < 0, -tiny, tiny), c)
            return 1.0 / safe

        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        oix, oiy, oiz = ox * ix, oy * iy, oz * iz
        tmax0 = tmax_ref[:, :]
        dead = tmax0 < 0.0            # retired lanes: exclude from
                                      # bounds so they never widen them

        # Hit state lives in the OUTPUT refs (loop-carry would spill).
        t_ref[:, :] = tmax0
        tri_ref[:, :] = jnp.full((rows, TILE_LANES), -1, jnp.int32)
        u_ref[:, :] = jnp.zeros((rows, TILE_LANES), jnp.float32)
        v_ref[:, :] = jnp.zeros((rows, TILE_LANES), jnp.float32)

        def group_bounds(q, hi: bool):
            neutral = jnp.float32(-1e32 if hi else 1e32)
            qm = jnp.where(dead, neutral, q)
            parts = []
            for g in range(ng):
                sl = qm[8 * g:8 * (g + 1)]
                parts.append(jnp.max(sl, axis=(0, 1), keepdims=True)
                             if hi else
                             jnp.min(sl, axis=(0, 1), keepdims=True))
            return jnp.concatenate(parts, axis=1)        # (1, ng)

        ixl, ixh = group_bounds(ix, False), group_bounds(ix, True)
        iyl, iyh = group_bounds(iy, False), group_bounds(iy, True)
        izl, izh = group_bounds(iz, False), group_bounds(iz, True)
        oxl, oxh = group_bounds(oix, False), group_bounds(oix, True)
        oyl, oyh = group_bounds(oiy, False), group_bounds(oiy, True)
        ozl, ozh = group_bounds(oiz, False), group_bounds(oiz, True)
        tlim_ref[0:1, :] = jnp.pad(
            jnp.concatenate(
                [jnp.max(tmax0[8 * g:8 * (g + 1)], axis=(0, 1),
                         keepdims=True) for g in range(ng)], axis=1),
            ((0, 0), (0, TILE_LANES - ng)), constant_values=-1.0)
        done_ref[0] = jnp.int32(0)
        giota = jax.lax.broadcasted_iota(jnp.int32, (1, ng), 1)

        def node_test(box, tlim):
            """Conservative any-ray-hits-box per group -> (1, ng)."""
            bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = box

            def axis(bl, bh, il, ih, ol, oh):
                # Outer bounds of min/max(bl*i - o, bh*i - o) over the
                # group's [il,ih] x [ol,oh] intervals (sign-safe).
                p1, p2 = bl * il, bl * ih
                p3, p4 = bh * il, bh * ih
                lo = jnp.minimum(jnp.minimum(p1, p2),
                                 jnp.minimum(p3, p4)) - oh
                hi = jnp.maximum(jnp.maximum(p1, p2),
                                 jnp.maximum(p3, p4)) - ol
                return lo, hi

            xl, xh = axis(bminx, bmaxx, ixl, ixh, oxl, oxh)
            yl, yh = axis(bminy, bmaxy, iyl, iyh, oyl, oyh)
            zl, zh = axis(bminz, bmaxz, izl, izh, ozl, ozh)
            t_near = jnp.maximum(jnp.maximum(xl, yl),
                                 jnp.maximum(zl, tmin))
            t_far = jnp.minimum(jnp.minimum(xh, yh),
                                jnp.minimum(zh, tlim))
            return t_near <= t_far

        def cond(st):
            cur = st[0]
            if find_closest:
                return cur < m_real
            return (cur < m_real) & (done_ref[0] == 0)

        def step(st):
            cur, n_vis, n_leaf = st
            active = cur < m_real
            box, leaf_v, skip_v = _node_decode(
                fetch(cur), jnp.minimum(cur, m_real - 1))
            tlim = tlim_ref[0:1, 0:ng]
            ghit = node_test(box, tlim)
            gm_v = jnp.sum(jnp.where(ghit, jnp.int32(1) << giota, 0),
                           axis=1, keepdims=True)        # (1, 1)
            any_v = gm_v > 0
            is_leaf_v = leaf_v > 0
            descend_v = any_v & jnp.logical_not(is_leaf_v)
            nxt_v = jnp.where(descend_v, cur + 1, skip_v)
            # One packed crossing: cursor | group bits | take_leaf.
            p = jnp.sum(nxt_v * 2048
                        + jnp.where(any_v & is_leaf_v, gm_v, 0) * 2
                        + (any_v & is_leaf_v).astype(jnp.int32))
            take_leaf = active & ((p & 1) == 1)
            gm = (p >> 1) & 1023
            nxt = p >> 11

            @pl.when(take_leaf)
            def _leaf():
                # Per-group leaf, gated by the crossing's frustum bits.
                # Measured round 2 (bench scene closest pass): this
                # form 1.87 ms vs classic kernel 1.94, full-tile leaf
                # 2.18, roll+static-slice extraction blocked by
                # Mosaic's missing both-axes broadcast, pltpu.repeat
                # broadcast 3.84.
                start = jnp.maximum(jnp.sum(leaf_v) - 1, 0)
                lane0 = start % TILE_LANES
                if tris_in_vmem:
                    rec = _leaf_fetch(tris_ref, start)
                else:
                    rec = _leaf_fetch(tris_ref, start, scratch[0],
                                      scratch[1])
                unroll = min(LEAF_UNROLL, leaf_size)
                while leaf_size % unroll:
                    unroll -= 1

                for g in range(ng):
                    sl = slice(8 * g, 8 * (g + 1))

                    @pl.when(((gm >> g) & 1) == 1)
                    def _group(sl=sl, g=g):
                        bt = t_ref[sl, :]
                        bi = tri_ref[sl, :]
                        u_ = u_ref[sl, :]
                        v_ = v_ref[sl, :]
                        gox, goy, goz = ox[sl], oy[sl], oz[sl]
                        gdx, gdy, gdz = dx[sl], dy[sl], dz[sl]

                        def tri_body(gk, args):
                            bt, bi, u_, v_ = args
                            for kk in range(unroll):
                                k = gk * unroll + kk
                                tri = _tri_vecs(rec, lane0 + k)
                                h, t, u, v = _moller(
                                    tri, gox, goy, goz, gdx, gdy, gdz,
                                    tmin, bt)
                                bi = jnp.where(h, start + k, bi)
                                if find_closest:
                                    u_ = jnp.where(h, u, u_)
                                    v_ = jnp.where(h, v, v_)
                                    bt = jnp.where(h, t, bt)
                            return bt, bi, u_, v_

                        bt, bi, u_, v_ = jax.lax.fori_loop(
                            0, leaf_size // unroll, tri_body,
                            (bt, bi, u_, v_))
                        if not find_closest:
                            # per-lane shadow retirement
                            occ = bi >= 0
                            bt = jnp.where(occ, jnp.float32(-1.0), bt)
                        t_ref[sl, :] = bt
                        tri_ref[sl, :] = bi
                        if find_closest:
                            u_ref[sl, :] = u_
                            v_ref[sl, :] = v_
                        # Refresh the group's t-cull bound in place.
                        tlim_ref[0:1, g:g + 1] = jnp.max(
                            bt, axis=(0, 1), keepdims=True)

                if not find_closest:
                    # all groups fully occluded -> whole-tile early out
                    done_ref[0] = (jnp.sum(
                        jnp.max(tlim_ref[0:1, 0:ng], axis=(0, 1),
                                keepdims=True)) < 0).astype(jnp.int32)

            n_vis = n_vis + active.astype(jnp.int32)
            if DEBUG_COUNTERS:
                pc = jnp.int32(0)
                for g in range(ng):
                    pc = pc + ((gm >> g) & 1)
                n_leaf = n_leaf + jnp.where(take_leaf, 1024 + pc, 0)
            else:
                n_leaf = n_leaf + take_leaf.astype(jnp.int32)
            cur = jnp.where(active, nxt, cur)
            return cur, n_vis, n_leaf

        st = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        st = jax.lax.while_loop(cond, step, st)
        _, n_vis, n_leaf = st
        if DEBUG_COUNTERS:
            riota = jax.lax.broadcasted_iota(
                jnp.int32, (rows, TILE_LANES), 0)
            cnt_ref[:, :] = jnp.where(
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
    use_frustum = (FRUSTUM and WALKS == 1 and TILE_ROWS % 8 == 0
                   and 1 <= TILE_ROWS // 8 <= 9
                   and m_real < (1 << 20)       # cursor packing bound
                   and flat_nodes.ndim != 4     # no octant tables
                   and not SPEC and PROBE == "")
    use_pipe2 = (PIPE2 and not use_frustum and WALKS == 1
                 and nodes_in_vmem and m_real < (1 << 27)
                 and flat_nodes.ndim != 4
                 and not SPEC and PROBE == "")
    if use_pipe2:
        kernel = _make_kernel_pipe2(m_real, leaf_size, t_min,
                                    find_closest,
                                    tris_in_vmem=tris_in_vmem)
    elif use_frustum:
        kernel = _make_kernel_frustum(m_real, leaf_size, t_min,
                                      find_closest,
                                      tris_in_vmem=tris_in_vmem,
                                      nodes_in_vmem=nodes_in_vmem)
    else:
        kernel = _make_kernel(m_real, leaf_size, t_min, find_closest,
                              tris_in_vmem=tris_in_vmem,
                              octant=flat_nodes.ndim == 4,
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
    if use_frustum:
        scratch_shapes += [
            pltpu.VMEM((1, TILE_LANES), jnp.float32),  # per-group tlim
            pltpu.SMEM((1,), jnp.int32),               # shadow done
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
            and 1 <= TILE_ROWS // 8 <= 8
            and not (FRUSTUM or PIPE2 or SPEC or OCT) and PROBE == "")


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
            t_min=float(t_min), find_closest=find_closest)[:4]
    else:
        nodes = flat.nodes
        if OCT and flat.nodes_oct is not None:
            nodes = flat.nodes_oct
        t, tri, u, v = _trace_tiles(
            *comps, nodes, flat.tris,
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
