"""Two-level (TLAS -> BLAS) traversal on the sublane-record BVH8.

The binary two-level kernel (ops/tlas.py) walks one node per iteration
with the full ray tile carried through two lax.conds — measured 7.1
Mray/s on the 256-instance bench config vs ~40 for the single-level
soup, exactly the per-visit vector->scalar-crossing wall the round-2
campaign quantified (ROADMAP).  This kernel applies the wide8 shape
(ops/traversal_wide8.py: ONE row fetch + ONE packed crossing per
8-child decision, hit state in output refs) to the reference's
BLAS-per-mesh + TLAS architecture (ref: Scene.cpp:163-254 createBottomAS
/ createTopAS; instance transforms at shaders/raytracing.slang:144-145):

- one unified (R, 8, 128) i32 record table: TLAS wide nodes first
  (leaf metas = original instance id + 1), then every mesh's BLAS
  region (leaf metas = global sorted triangle start + 1, bases
  globalized) — built in ops/tlas.py via wide8.globalize;
- the walk state is ONE SMEM stack of (base << 8 | rank-mask) entries
  plus instance entries -(inst+1) pushed when TLAS leaves are hit;
- entering an instance transforms the whole WORLD ray tile (from the
  input refs) by the instance's obj_from_world (12 scalars from SMEM)
  into a VMEM "active space" scratch; leaving the BLAS (stack drains
  to the entry level) restores world space from the input refs.
  Directions stay unnormalized so t is the world-space parameter and
  best-hit state never transforms back;
- node tests are the exact per-ray slab mode (the measured winner for
  both passes) reading per-ray current t from the output ref, so
  closest-hit culling tightens across instances for free.

Exactness: identical Moller tests to the binary kernel; the walk order
differs but closest-min/any-hit are order-independent (oracle-checked
in test_tlas8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import traversal_pallas as tp
from .traversal_pallas import (DEBUG_COUNTERS, TILE_LANES, TILE_ROWS,
                               _leaf_fetch, _moller, _tri_vecs)

I32 = jnp.int32
STACK_BASE = 64
# Probe decomposition (instancing attack, VERDICT r4 #2): "noenter"
# skips the per-instance tile re-basing (set_space) so its cost shows
# as the delta; "noleaf" skips the Moller phase.  Wrong results — perf
# probes only (scripts/tlas8_probe.py).
import os as _os
PROBE_T8 = _os.environ.get("HRT_TLAS8_PROBE", "")
# Per-tile (enters, visits, leaves, restores) from the last traced
# batch when HRT_DEBUG_COUNTERS=1 (stashed by tlas._run_planes).
LAST_COUNTERS = None


def _make_kernel(tlas_nw: int, n_inst: int, leaf_size: int, t_min: float,
                 find_closest: bool, tris_in_vmem: bool):
    rows = TILE_ROWS
    ng = rows // 8
    assert rows % 8 == 0 and ng <= 8

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               rec_ref, tris_ref, tf_ref, root_ref,
               t_ref, tri_ref, inst_ref, u_ref, v_ref, *rest):
        rest = list(rest)
        cnt_ref = rest.pop(0) if DEBUG_COUNTERS else None
        scratch = [rest.pop(0), rest.pop(0)] if not tris_in_vmem else []
        scr_ref, stack_ref = rest
        if DEBUG_COUNTERS:
            for c in range(4):
                cnt_ref[0, c] = jnp.int32(0)

        def bump(c):
            if DEBUG_COUNTERS:
                cnt_ref[0, c] = cnt_ref[0, c] + 1
        tmin = jnp.float32(t_min)
        tiny = jnp.float32(1e-20)

        def inv(c):
            safe = jnp.where(jnp.abs(c) < tiny,
                             jnp.where(c < 0, -tiny, tiny), c)
            return 1.0 / safe

        def set_space(tox, toy, toz, tdx, tdy, tdz):
            """Write the active-space ray planes: 0:6 = (ix, iy, iz,
            o*ix, o*iy, o*iz) for slab tests, 6:12 = (o, d) for Moller."""
            ix, iy, iz = inv(tdx), inv(tdy), inv(tdz)
            vals = (ix, iy, iz, tox * ix, toy * iy, toz * iz,
                    tox, toy, toz, tdx, tdy, tdz)
            for c, val in enumerate(vals):
                scr_ref[c, :, :] = val

        def set_space_groups(gm, m):
            """Per-GROUP instance re-basing: transform only the 8-row
            groups whose bit is set in gm (the instance's TLAS-leaf hit
            mask) — the BLAS walk gates every node test, leaf push, and
            Moller round by the same mask, so untouched groups' planes
            are never read.  Entries typically hit 1-2 of the 8 groups
            (tlas8_probe counters), so this cuts the dominant enter
            cost (12 full-tile plane writes + the transform math) to
            the hit groups only."""
            for g in range(ng):
                sl = slice(8 * g, 8 * (g + 1))

                @pl.when(((gm >> g) & 1) == 1)
                def _(sl=sl):
                    wox, woy, woz = (ox_ref[sl, :], oy_ref[sl, :],
                                     oz_ref[sl, :])
                    wdx, wdy, wdz = (dx_ref[sl, :], dy_ref[sl, :],
                                     dz_ref[sl, :])
                    tox = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                    toy = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                    toz = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                    tdx = m[0] * wdx + m[1] * wdy + m[2] * wdz
                    tdy = m[4] * wdx + m[5] * wdy + m[6] * wdz
                    tdz = m[8] * wdx + m[9] * wdy + m[10] * wdz
                    ix, iy, iz = inv(tdx), inv(tdy), inv(tdz)
                    vals = (ix, iy, iz, tox * ix, toy * iy, toz * iz,
                            tox, toy, toz, tdx, tdy, tdz)
                    for c, val in enumerate(vals):
                        scr_ref[c, sl, :] = val

        def set_world(gm=None):
            if gm is None:
                set_space(ox_ref[:, :], oy_ref[:, :], oz_ref[:, :],
                          dx_ref[:, :], dy_ref[:, :], dz_ref[:, :])
                return
            # Restore only the groups the last instance entry dirtied.
            for g in range(ng):
                sl = slice(8 * g, 8 * (g + 1))

                @pl.when(((gm >> g) & 1) == 1)
                def _(sl=sl):
                    tox, toy, toz = (ox_ref[sl, :], oy_ref[sl, :],
                                     oz_ref[sl, :])
                    tdx, tdy, tdz = (dx_ref[sl, :], dy_ref[sl, :],
                                     dz_ref[sl, :])
                    ix, iy, iz = inv(tdx), inv(tdy), inv(tdz)
                    vals = (ix, iy, iz, tox * ix, toy * iy, toz * iz,
                            tox, toy, toz, tdx, tdy, tdz)
                    for c, val in enumerate(vals):
                        scr_ref[c, sl, :] = val

        set_world()
        t_ref[:, :] = tmax_ref[:, :]
        tri_ref[:, :] = jnp.full((rows, TILE_LANES), -1, I32)
        inst_ref[:, :] = jnp.full((rows, TILE_LANES), -1, I32)
        u_ref[:, :] = jnp.zeros((rows, TILE_LANES), jnp.float32)
        v_ref[:, :] = jnp.zeros((rows, TILE_LANES), jnp.float32)
        stack_ref[0] = jnp.int32(1)   # TLAS root: wide id 0, rank 0

        sub1 = jax.lax.broadcasted_iota(I32, (8, 1), 0)
        glane = jax.lax.broadcasted_iota(I32, (8, ng), 1)

        def node_test8_exact(boxes):
            """(8, ng) hit matrix: each child box vs every active-space
            ray row, far-capped by the ray's CURRENT world t (see
            traversal_wide8.node_test8_exact)."""
            reps = [pltpu.repeat(b, TILE_LANES, axis=1) for b in boxes]
            bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = reps
            ghit = jnp.zeros((8, ng), I32)
            for g in range(8):
                if g >= ng:
                    break
                acc = jnp.zeros((8, TILE_LANES), jnp.bool_)
                for rr in range(8):
                    rw = slice(8 * g + rr, 8 * g + rr + 1)
                    ixr = scr_ref[0, rw, :]
                    iyr = scr_ref[1, rw, :]
                    izr = scr_ref[2, rw, :]
                    oixr = scr_ref[3, rw, :]
                    oiyr = scr_ref[4, rw, :]
                    oizr = scr_ref[5, rw, :]
                    tx0 = bminx * ixr - oixr
                    tx1 = bmaxx * ixr - oixr
                    ty0 = bminy * iyr - oiyr
                    ty1 = bmaxy * iyr - oiyr
                    tz0 = bminz * izr - oizr
                    tz1 = bmaxz * izr - oizr
                    t_near = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), tmin))
                    t_far = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1),
                                    t_ref[rw, :]))
                    acc = acc | (t_near <= t_far)
                anyg = jnp.any(acc, axis=1, keepdims=True)
                ghit = jnp.where(glane == g, anyg.astype(I32), ghit)
            return ghit > 0

        def cond(st):
            # No shadow done-flag: the exact node tests read per-ray t
            # (occluded lanes carry -1), so exhausted subtrees stop
            # expanding and the stack drains through cheap all-miss
            # visits — the flag update cost one vector->scalar crossing
            # per leaf visit (see traversal_wide8.cond).
            return st[0] > 0

        def step(st):
            sp, cur_inst, inst_base, gm0, dirty = st
            sp = sp - 1
            e = stack_ref[sp]
            # Restore world space lazily: only when the popped entry is
            # a WORLD node while the scratch still holds some instance's
            # object space.  Consecutive instance entries (the common
            # case: several instances pending from one TLAS visit) skip
            # the restore entirely — enter_fn reads the input refs.
            # Only the groups dirtied since the last world state (the
            # union of the intervening entries' masks) are restored.
            leave = (e >= 0) & (cur_inst >= 0) & (sp < inst_base)

            @pl.when(leave)
            def _():
                bump(3)
                if PROBE_T8 != "noenter":
                    set_world(dirty)

            cur_inst = jnp.where(leave, -1, cur_inst)
            gm0 = jnp.where(leave, 255, gm0)
            dirty = jnp.where(leave, 0, dirty)

            def enter_fn(sp, cur_inst, inst_base, gm0, dirty):
                """TLAS instance leaf: re-base the hit GROUPS of the
                tile into the instance's object space + push its BLAS
                root.  The entry carries the instance's per-group AABB
                hit mask: groups that missed the instance box cannot
                hit its BLAS (exact per-ray tests at the TLAS leaf), so
                the whole BLAS walk — and the re-basing itself — is
                gated by it."""
                v = -e
                gm = v & 255
                iid = (v >> 8) - 1
                bump(0)
                if PROBE_T8 != "noenter":
                    m = [tf_ref[iid, c] for c in range(12)]
                    set_space_groups(gm, m)
                stack_ref[sp] = (root_ref[iid, 0] << 8) | 1
                return sp + 1, iid, sp, gm, dirty | gm

            def visit_fn(sp, cur_inst, inst_base, gm0, dirty):
                bump(1)
                mask = e & 255
                b = e >> 8
                low = mask & (0 - mask)
                rem = mask ^ low
                r = (((low & 0xAA) != 0).astype(I32)
                     + 2 * ((low & 0xCC) != 0).astype(I32)
                     + 4 * ((low & 0xF0) != 0).astype(I32))

                @pl.when(rem != 0)
                def _():
                    stack_ref[sp] = (b << 8) | rem

                sp = sp + (rem != 0).astype(I32)
                cur = b + r
                in_tlas = cur < tlas_nw

                q = cur % 16
                rec = rec_ref[pl.ds(cur // 16, 1)]       # (1, 8, 128)
                rec = pltpu.roll(rec, (16 - q) % 16 * 8, axis=2)
                meta = rec[:, :, 6:7][0]                 # (8, 1)
                base_l = rec[:, :, 7:8][0]
                boxes = [pltpu.bitcast(rec[:, :, c:c + 1],
                                       jnp.float32)[0] for c in range(6)]

                ghit = node_test8_exact(boxes)           # (8, ng)
                # Gate by the current instance's entry group mask (255
                # at world level): one vector AND prevents any gated
                # group from driving descents, leaf pushes, or Moller.
                ghit = ghit & ((jnp.right_shift(gm0, glane) & 1) > 0)
                childhit = jnp.any(ghit, axis=1, keepdims=True)
                is_int = meta < 0
                is_leaf = meta > 0
                rank = jnp.clip(-meta - 1, 0, 7)
                int_bits = jnp.where(is_int & childhit,
                                     jnp.int32(1) << rank, 0)
                leaf_bits = jnp.where(is_leaf & childhit,
                                      jnp.int32(256) << sub1, 0)
                p = jnp.sum(int_bits + leaf_bits + base_l * 65536)
                int_mask = p & 255
                leaf_mask = (p >> 8) & 255
                base = p >> 16

                @pl.when(int_mask != 0)
                def _():
                    stack_ref[sp] = (base << 8) | int_mask

                sp = sp + (int_mask != 0).astype(I32)

                ghit_i = ghit.astype(I32) << glane

                def tlas_leaves(sp):
                    """Hit instance children -> stack entries
                    -((inst+1) << 8 | group-hit-mask) (one crossing
                    each; TLAS visits are rare)."""
                    off = jnp.int32(0)
                    for j in range(8):
                        bit = (leaf_mask >> j) & 1

                        @pl.when(bit == 1)
                        def _(j=j, off=off):
                            qv = jnp.sum(
                                jnp.where(sub1 == j, ghit_i, 0)
                                + jnp.where((sub1 == j) & (glane == 0),
                                            meta * 256, 0))
                            stack_ref[sp + off] = -qv

                        off = off + bit
                    return sp + off

                def blas_leaves(sp):
                    if PROBE_T8 == "noleaf":
                        return sp
                    for j in range(8):
                        @pl.when(((leaf_mask >> j) & 1) == 1)
                        def _leaf(j=j):
                            bump(2)
                            qv = jnp.sum(
                                jnp.where(sub1 == j, ghit_i, 0)
                                + jnp.where((sub1 == j) & (glane == 0),
                                            meta * 256, 0))
                            start = (qv >> 8) - 1
                            gm = qv & 255
                            lane0 = start % TILE_LANES
                            if tris_in_vmem:
                                lrec = _leaf_fetch(tris_ref, start)
                            else:
                                lrec = _leaf_fetch(tris_ref, start,
                                                   scratch[0], scratch[1])
                            # One extraction per leaf visit (see
                            # traversal_wide8: the masked reduces are
                            # group-independent).
                            tris_k = [_tri_vecs(lrec, lane0 + k)
                                      for k in range(leaf_size)]

                            for g in range(ng):
                                sl = slice(8 * g, 8 * (g + 1))

                                @pl.when(((gm >> g) & 1) == 1)
                                def _group(sl=sl, g=g, start=start):
                                    bt = t_ref[sl, :]
                                    bi = tri_ref[sl, :]
                                    bn = inst_ref[sl, :]
                                    u_ = u_ref[sl, :]
                                    v_ = v_ref[sl, :]
                                    gox = scr_ref[6, sl, :]
                                    goy = scr_ref[7, sl, :]
                                    goz = scr_ref[8, sl, :]
                                    gdx = scr_ref[9, sl, :]
                                    gdy = scr_ref[10, sl, :]
                                    gdz = scr_ref[11, sl, :]

                                    for k in range(leaf_size):
                                        h, t, u, v = _moller(
                                            tris_k[k], gox, goy, goz,
                                            gdx, gdy, gdz, tmin, bt)
                                        bi = jnp.where(h, start + k, bi)
                                        bn = jnp.where(h, cur_inst, bn)
                                        if find_closest:
                                            u_ = jnp.where(h, u, u_)
                                            v_ = jnp.where(h, v, v_)
                                            bt = jnp.where(h, t, bt)
                                    if not find_closest:
                                        occ = bi >= 0
                                        bt = jnp.where(
                                            occ, jnp.float32(-1.0), bt)
                                    t_ref[sl, :] = bt
                                    tri_ref[sl, :] = bi
                                    inst_ref[sl, :] = bn
                                    if find_closest:
                                        u_ref[sl, :] = u_
                                        v_ref[sl, :] = v_

                    return sp

                sp = jax.lax.cond(in_tlas & (leaf_mask != 0),
                                  tlas_leaves, blas_leaves, sp)
                return sp, cur_inst, inst_base, gm0, dirty

            return jax.lax.cond(e < 0, enter_fn, visit_fn,
                                sp, cur_inst, inst_base, gm0, dirty)

        st = (jnp.int32(1), jnp.int32(-1), jnp.int32(0), jnp.int32(255),
              jnp.int32(0))
        jax.lax.while_loop(cond, step, st)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tlas_nw", "leaf_size", "t_min",
                                    "find_closest"))
def _trace_tiles_tlas8(ox, oy, oz, dx, dy, dz, tmax, records, flat_tris,
                       tf, roots, tlas_nw: int, leaf_size: int,
                       t_min: float, find_closest: bool):
    rows = ox.shape[0]
    n_tiles = rows // TILE_ROWS
    n_inst = tf.shape[0]
    tris_in_vmem = (records.size + flat_tris.size) <= tp.MAX_VMEM_F32

    kernel = _make_kernel(tlas_nw, n_inst, leaf_size, t_min,
                          find_closest, tris_in_vmem)
    ray_spec = pl.BlockSpec((TILE_ROWS, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tri_spec = (vmem_spec if tris_in_vmem
                else pl.BlockSpec(memory_space=pl.ANY))
    scratch_shapes = [] if tris_in_vmem else [
        pltpu.VMEM((1, 16, TILE_LANES), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    scratch_shapes += [
        pltpu.VMEM((12, TILE_ROWS, TILE_LANES), jnp.float32),  # rays
        pltpu.SMEM((STACK_BASE + n_inst,), jnp.int32),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), I32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), I32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
    ]
    out_specs = [ray_spec] * 5
    if DEBUG_COUNTERS:
        # Per-tile (enters, visits, leaves, leaves-of-world-restore)
        # counts in SMEM — scripts/tlas8_probe.py sums them.
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, 4), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 4), lambda i: (i, 0),
                                      memory_space=pltpu.SMEM))
    assert records.dtype == jnp.int32
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 7 + [vmem_spec, tri_spec,
                                   smem_spec, smem_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(jax.default_backend() == "cpu"),
    )(ox, oy, oz, dx, dy, dz, tmax, records, flat_tris, tf, roots)
    return tuple(out)
