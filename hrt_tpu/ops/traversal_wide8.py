"""Pallas traversal over the sublane-record BVH8 (ops/wide8.py).

The round-2 probe campaign (ROADMAP) isolated the packet kernel's wall:
~0.95 us/visit of the scalar core stalling on vector->scalar crossings
that do not overlap — one crossing per 1-2 binary node decisions.  This
kernel restructures traversal so ONE crossing decides EIGHT subtrees:

  pop (base, mask) from an SMEM stack          [scalar ops only]
  cur = base + ctz(mask); re-push the rest
  ONE row fetch + ONE dynamic lane roll        -> all 8 child boxes as
                                                  (8, 1) sublane values
  conservative per-group interval tests        -> (8, ng) tiny VPU math
                                                  (the frustum kernel's
                                                  shallow-chain trick)
  ONE packed crossing: base | int-hits | leaf-hits
  push (child_base, int_hit_mask)              [scalar]
  per hit leaf child: one more (predicated) crossing carrying
  (tri_start | group bits), then exact per-group Moller tests with hit
  state living in the OUTPUT REFS (no carried vector state to spill).

Exactness: interval tests over-approximate per-ray slab tests (superset
walk); hits come only from exact Moller tests, identical to the binary
packet kernel (oracle-checked in test_fuzz / test_wide8).

Hardware analogue in the reference: the driver's wide-BVH traversal
behind TraceRay (shaders/raytracing.slang:67,121), including the
ACCEPT_FIRST_HIT_AND_END_SEARCH shadow mode (per-lane retirement +
whole-tile early exit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import traversal_pallas as tp
from .traversal_pallas import (
    DEBUG_COUNTERS, TILE_LANES, TILE_ROWS,
    _leaf_fetch, _moller, _tri_vecs,
)

I32 = jnp.int32
STACK = 64          # >= wide-tree depth bound (binary 64 / 3) + slack
NPR = 16            # nodes per record row
# Probe decomposition (scripts/w8_probe): "noleaf" walks but skips the
# whole leaf phase; "noextract" runs leaf crossings but no Moller work.
import os as _os
PROBE8 = _os.environ.get("HRT_W8_PROBE", "")


def _make_kernel(nw: int, leaf_size: int, t_min: float,
                 find_closest: bool, tris_in_vmem: bool = True,
                 exact: bool = False, leaf_base: bool = False,
                 pack: bool = False,
                 guards: bool = False, n_tri_lanes: int = 0,
                 rows: int = 0):
    """exact=False: conservative per-group interval node tests (fast
    for coherent bundles — primary/bounce blocks).  exact=True: per-RAY
    slab tests of all 8 children against every ray row (the box is
    lane-repeated, the ray row sublane-broadcast) — 64 one-vreg tests
    per visit, but ZERO over-expansion.  Shadow fans NEED exact: their
    spread origins + converging directions make any group interval
    useless (measured 74 vs 14 leaf-visits/tile, 2.6x pass blowup).
    Exact also reads each ray's CURRENT t from the output ref, so
    retired lanes (t=-1) stop driving expansion for free."""
    rows = rows or TILE_ROWS
    ng = rows // 8
    assert rows % 8 == 0 and ng <= 8, "wide8 packs ng group bits"

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               bnd_ref, rec_ref, tris_ref, t_ref, tri_ref, u_ref, v_ref,
               *rest):
        if DEBUG_COUNTERS:
            cnt_ref, *rest = rest
        rest = list(rest)
        guard_ref = rest.pop(0) if guards else None
        scratch = [rest.pop(0), rest.pop(0)] if not tris_in_vmem else []
        tlim_ref, done_ref, stack_ref = rest
        tmin = jnp.float32(t_min)
        if guards:
            # Debug-mode validators (HRT_KERNEL_GUARDS=1): clamp every
            # dynamic index into range and record a violation bitmask
            # per tile, so a corrupted record table (e.g. the round-3
            # reorder base-masking bug, ROADMAP) surfaces as a host-
            # checkable flag instead of a TPU device fault.
            guard_ref[0] = jnp.int32(0)

            def _guard(val, lo, hi, bit):
                bad = (val < lo) | (val > hi)

                @pl.when(bad)
                def _():
                    guard_ref[0] = guard_ref[0] | bit

                return jnp.clip(val, lo, hi)
        else:
            _guard = lambda val, lo, hi, bit: val

        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        tmax0 = tmax_ref[:, :]
        if exact:
            tiny = jnp.float32(1e-20)

            def inv(c):
                safe = jnp.where(jnp.abs(c) < tiny,
                                 jnp.where(c < 0, -tiny, tiny), c)
                return 1.0 / safe

            ix, iy, iz = inv(dx), inv(dy), inv(dz)
            oix, oiy, oiz = ox * ix, oy * iy, oz * iz

        # Hit state lives in the output refs (carried vector state
        # spills — measured ~0.5 us per taken lax.cond branch).
        t_ref[:, :] = tmax0
        tri_ref[:, :] = jnp.full((rows, TILE_LANES), -1, jnp.int32)
        u_ref[:, :] = jnp.zeros((rows, TILE_LANES), jnp.float32)
        v_ref[:, :] = jnp.zeros((rows, TILE_LANES), jnp.float32)

        # Per-group, sign-class-split interval bounds are computed
        # OUTSIDE the kernel (group_ray_bounds: one fused XLA pass) —
        # computing bounds in-kernel cost 46 us/tile of the 76 us total
        # (measured, HRT_W8_PROBE=novisit): 96 tiny masked reduces +
        # concats swamped the walk.
        bnd = bnd_ref[0]                                  # (32, 128)
        row = lambda i: bnd[i:i + 1, 0:ng]                # (1, ng)
        abnd = [tuple(row(a * 8 + c * 4 + k) for k in range(4))
                for a in range(3) for c in range(2)]      # (il,ih,ol,oh)
        tlim_ref[0:1, :] = bnd[24:25, :]
        done_ref[0] = jnp.int32(0)
        # Root entry: base 0, one "internal child" of rank 0.
        stack_ref[0] = jnp.int32(1)

        sub1 = jax.lax.broadcasted_iota(I32, (8, 1), 0)   # child slot
        glane = jax.lax.broadcasted_iota(I32, (8, ng), 1)  # group lane

        def node_test8(boxes, tlim):
            """Conservative 8-children x ng-groups hit matrix (8, ng):
            outer interval bounds of every group's slab terms — the
            frustum kernel's shallow-chain decision math, sublane-
            parallel over children.  Per axis, the child interval is
            the UNION of the two sign-class intervals (tight even for
            mixed-sign shadow fans; see group_ray_bounds)."""
            bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = boxes

            def axis(bl, bh, cls0, cls1):
                def one(cls):
                    il, ih, ol, oh = cls
                    p1, p2 = bl * il, bl * ih
                    p3, p4 = bh * il, bh * ih
                    lo = jnp.minimum(jnp.minimum(p1, p2),
                                     jnp.minimum(p3, p4)) - oh
                    hi = jnp.maximum(jnp.maximum(p1, p2),
                                     jnp.maximum(p3, p4)) - ol
                    return lo, hi

                lo0, hi0 = one(cls0)
                lo1, hi1 = one(cls1)
                return jnp.minimum(lo0, lo1), jnp.maximum(hi0, hi1)

            xl, xh = axis(bminx, bmaxx, abnd[0], abnd[1])
            yl, yh = axis(bminy, bmaxy, abnd[2], abnd[3])
            zl, zh = axis(bminz, bmaxz, abnd[4], abnd[5])
            t_near = jnp.maximum(jnp.maximum(xl, yl),
                                 jnp.maximum(zl, tmin))
            t_far = jnp.minimum(jnp.minimum(xh, yh),
                                jnp.minimum(zh, tlim))
            return t_near <= t_far

        def node_test8_exact(boxes):
            """Exact per-ray slab tests: each child box (lane-repeated
            (8, 128)) against every ray row ((1, 128), sublane-
            broadcast), OR-accumulated per group, any() per child —
            (8, ng) hit matrix with zero over-expansion.  The per-ray
            far limit comes from t_ref, so closest-pass culling
            tightens per ray and retired lanes (-1) drop out."""
            reps = [pltpu.repeat(b, TILE_LANES, axis=1) for b in boxes]
            bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = reps
            # i32 accumulator: Mosaic can't lower selects over 1-bit
            # vregs ("Unsupported target bitwidth for truncation").
            ghit = jnp.zeros((8, ng), I32)
            for g in range(8):
                if g >= ng:
                    break
                acc = jnp.zeros((8, TILE_LANES), jnp.bool_)
                for rr in range(8):
                    rw = slice(8 * g + rr, 8 * g + rr + 1)
                    ixr, iyr, izr = ix[rw], iy[rw], iz[rw]   # (1, 128)
                    oixr, oiyr, oizr = oix[rw], oiy[rw], oiz[rw]
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
                anyg = jnp.any(acc, axis=1, keepdims=True)   # (8, 1)
                ghit = jnp.where(glane == g, anyg.astype(I32), ghit)
            return ghit > 0

        def cond(st):
            sp = st[0]
            if PROBE8 == "novisit":
                return sp < 0
            if find_closest or exact:
                # Exact-mode shadows need no done flag: occluded lanes
                # carry t = -1 into the node tests, so fully-occluded
                # subtrees stop expanding and the stack drains through
                # a few all-miss visits — cheaper than the one
                # vector->scalar crossing PER LEAF VISIT the flag
                # update cost (with the per-group tlim reduces also
                # dropped: closest 0.584 -> 0.514 ms, shadow 0.657 ->
                # 0.559 ms on the bench passes).
                return sp > 0
            return (sp > 0) & (done_ref[0] == 0)

        def step(st):
            sp, n_vis, n_leaf = st
            # Pop: visit the lowest-rank remaining child; re-push the
            # rest of the entry (pure scalar SMEM work — no crossings).
            sp = sp - 1
            e = stack_ref[sp]
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
            sp = _guard(sp, 0, STACK - 2, 2)      # room for 2 pushes
            cur = _guard(b + r, 0, nw - 1, 1)

            # ONE row fetch + ONE roll exposes the whole node.  The
            # records are i32 (wide8.py: f32 movement canonicalizes NaN
            # payloads, destroying bit-carried metas); the box lanes
            # are bitcast back to f32 here.
            q = cur % NPR
            rec = rec_ref[pl.ds(cur // NPR, 1)]          # (1, 8, 128)
            rec = pltpu.roll(rec, (NPR - q) % NPR * 8, axis=2)
            meta = rec[:, :, 6:7][0]                     # (8, 1)
            base_l = rec[:, :, 7:8][0]                   # (8, 1): slot0
            boxes = [pltpu.bitcast(rec[:, :, c:c + 1],
                                   jnp.float32)[0] for c in range(6)]

            if exact:
                ghit = node_test8_exact(boxes)           # (8, ng)
            else:
                tlim = tlim_ref[0:1, 0:ng]
                ghit = node_test8(boxes, tlim)           # (8, ng)
            childhit = jnp.any(ghit, axis=1, keepdims=True)  # (8, 1)
            is_int = meta < 0
            is_leaf = meta > 0
            rank = jnp.clip(-meta - 1, 0, 7)
            int_bits = jnp.where(is_int & childhit,
                                 jnp.int32(1) << rank, 0)
            leaf_bits = jnp.where(is_leaf & childhit,
                                  jnp.int32(256) << sub1, 0)
            # ONE packed crossing: base | leaf slots | internal ranks.
            # Reorder-built records carry leaf_base<<8 in sublane 1 of
            # lane 7 (read by the leaf crossing below) — mask base to
            # sublane 0 ALWAYS, not just in leaf_base mode, or the
            # HRT_W8_LB=0 A/B path walks corrupted bases on the same
            # records (out-of-bounds fetch -> device fault).
            base_b = jnp.where(sub1 == 0, base_l, 0)
            p = jnp.sum(int_bits + leaf_bits + base_b * 65536)
            int_mask = p & 255
            leaf_mask = (p >> 8) & 255
            base = p >> 16

            @pl.when(int_mask != 0)
            def _():
                stack_ref[sp] = (base << 8) | int_mask

            sp = sp + (int_mask != 0).astype(I32)

            # Hit leaf children: exact per-group Moller tests, gated by
            # a group mask (a packed crossing carries tri_start and the
            # group bits together).
            ghit_i = ghit.astype(I32) << glane           # (8, ng)

            def leaf_body(start, gm):
                if PROBE8 == "noextract":
                    # Sink into the unused tlim padding lane so the
                    # crossing survives DCE without altering the walk.
                    tlim_ref[0:1, ng:ng + 1] = jnp.full(
                        (1, 1), (start + gm).astype(jnp.float32))
                    return
                start = _guard(start, 0, n_tri_lanes - leaf_size, 4)
                lane0 = start % TILE_LANES
                if tris_in_vmem:
                    lrec = _leaf_fetch(tris_ref, start)
                else:
                    lrec = _leaf_fetch(tris_ref, start, scratch[0],
                                       scratch[1])
                # Extract all K triangles ONCE per leaf visit (the
                # masked reduces are group-independent; re-running
                # them inside every hit group's branch measured
                # ~25% of the shadow pass).  Reduce-produced (1,1)
                # values broadcast against the (8,128) ray groups
                # for free.
                tris_k = [_tri_vecs(lrec, lane0 + k)
                          for k in range(leaf_size)]

                for g in range(ng):
                    sl = slice(8 * g, 8 * (g + 1))

                    @pl.when(((gm >> g) & 1) == 1)
                    def _group(sl=sl, g=g, start=start):
                        bt = t_ref[sl, :]
                        bi = tri_ref[sl, :]
                        u_ = u_ref[sl, :]
                        v_ = v_ref[sl, :]
                        gox, goy, goz = ox[sl], oy[sl], oz[sl]
                        gdx, gdy, gdz = dx[sl], dy[sl], dz[sl]

                        for k in range(leaf_size):
                            h, t, u, v = _moller(
                                tris_k[k], gox, goy, goz,
                                gdx, gdy, gdz, tmin, bt)
                            bi = jnp.where(h, start + k, bi)
                            if find_closest:
                                u_ = jnp.where(h, u, u_)
                                v_ = jnp.where(h, v, v_)
                                bt = jnp.where(h, t, bt)
                        if not find_closest:
                            occ = bi >= 0
                            bt = jnp.where(occ, jnp.float32(-1.0),
                                           bt)
                        t_ref[sl, :] = bt
                        tri_ref[sl, :] = bi
                        if find_closest:
                            u_ref[sl, :] = u_
                            v_ref[sl, :] = v_
                        if not exact:
                            # Interval mode culls through tlim (the
                            # exact test reads t_ref directly).
                            tlim_ref[0:1, g:g + 1] = jnp.max(
                                bt, axis=(0, 1), keepdims=True)

            if pack and PROBE8 != "noleaf":
                # Packed leaf crossings (requires reorder-built records:
                # leaf children at leaf_base + j*K, leaf_base<<8 carried
                # in sublane 1 of lane 7).  The per-child scheme below
                # pays ONE ~0.5-0.75 us crossing per HIT CHILD — the
                # measured round-3 wall, and on incoherent 1080p bounce
                # tiles visits hit ~2.3 children on average (saturated
                # ones up to 8).  Here the 8 children's EXACT group
                # masks ride in at most THREE crossings: w0 = leaf_base
                # | child-0 mask, w1 = children 1-3 masks, w2 =
                # children 4-7 masks — each pl.when-gated by leaf_mask
                # bits already in scalar space, so single-child visits
                # in slots 0-3 still pay <= 2.  Moller work is
                # IDENTICAL to the per-child scheme (same masks).
                @pl.when(leaf_mask != 0)
                def _leaves():
                    mg = jnp.where(is_leaf & ghit, ghit_i, 0)  # (8, ng)
                    w0 = jnp.sum(
                        jnp.where(sub1 == 0, mg, 0)
                        + jnp.where((sub1 == 1) & (glane == 0),
                                    base_l, 0))
                    lb = w0 >> 8

                    @pl.when((leaf_mask & 1) == 1)
                    def _():
                        leaf_body(lb, w0 & 255)

                    @pl.when((leaf_mask & 0x0E) != 0)
                    def _mid():
                        sh1 = jnp.clip((sub1 - 1) * 8, 0, 16)
                        w1 = jnp.sum(
                            jnp.where((sub1 >= 1) & (sub1 <= 3),
                                      mg << sh1, 0))
                        for j in (1, 2, 3):
                            @pl.when(((leaf_mask >> j) & 1) == 1)
                            def _(j=j):
                                leaf_body(lb + j * leaf_size,
                                          (w1 >> (8 * (j - 1))) & 255)

                    @pl.when((leaf_mask & 0xF0) != 0)
                    def _hi():
                        # Child 7's group-7 bit lands in bit 31; i32
                        # shifts are arithmetic but every extraction
                        # masks & 255, so sign smear is harmless.
                        sh2 = jnp.clip((sub1 - 4) * 8, 0, 24)
                        w2 = jnp.sum(
                            jnp.where(sub1 >= 4, mg << sh2, 0))
                        for j in (4, 5, 6, 7):
                            @pl.when(((leaf_mask >> j) & 1) == 1)
                            def _(j=j):
                                leaf_body(lb + j * leaf_size,
                                          (w2 >> (8 * (j - 4))) & 255)
            elif leaf_base and PROBE8 != "noleaf":
                # Leaf-base mode (wide8 reorder): the node's leaf
                # children sit at leaf_base + j*K, so ONE crossing per
                # leaf VISIT — leaf_base<<8 from record sublane 1 of
                # lane 7, UNION group mask over the hit children —
                # replaces one crossing per hit CHILD (the measured
                # round-3 wall).  The union over-tests groups that hit
                # only a sibling child; exactness is unaffected (Moller
                # decides) and the trade wins while crossings cost
                # ~0.5-0.75 us against (8,128)xK vector Moller.
                @pl.when(leaf_mask != 0)
                def _leaves():
                    ubits = jnp.max(
                        jnp.where(is_leaf & ghit, ghit_i, 0),
                        axis=0, keepdims=True)           # (1, ng) OR
                    lbrow = jnp.sum(
                        jnp.where((sub1 == 1) & (glane == 0),
                                  base_l, 0),
                        axis=0, keepdims=True)           # (1, ng)
                    q2 = jnp.sum(ubits + lbrow)          # ONE crossing
                    gm = q2 & 255
                    lb = q2 >> 8
                    for j in range(8):
                        @pl.when(((leaf_mask >> j) & 1) == 1)
                        def _leaf(j=j):
                            leaf_body(lb + j * leaf_size, gm)
            else:
                leaf_iter = (range(0) if PROBE8 == "noleaf"
                             else range(8))
                for j in leaf_iter:
                    @pl.when(((leaf_mask >> j) & 1) == 1)
                    def _leaf(j=j):
                        qv = jnp.sum(
                            jnp.where(sub1 == j, ghit_i, 0)
                            + jnp.where((sub1 == j) & (glane == 0),
                                        meta * 256, 0))
                        leaf_body((qv >> 8) - 1, qv & 255)

            if not find_closest and not exact:
                @pl.when(leaf_mask != 0)
                def _():
                    done_ref[0] = (jnp.sum(
                        jnp.max(tlim_ref[0:1, 0:ng], axis=(0, 1),
                                keepdims=True)) < 0).astype(jnp.int32)

            n_vis = n_vis + 1
            if DEBUG_COUNTERS:
                lc = jnp.int32(0)
                for j in range(8):
                    lc = lc + ((leaf_mask >> j) & 1)
                n_leaf = n_leaf + lc * 1024
            else:
                n_leaf = n_leaf + (leaf_mask != 0).astype(I32)
            return sp, n_vis, n_leaf

        st = (jnp.int32(1), jnp.int32(0), jnp.int32(0))
        st = jax.lax.while_loop(cond, step, st)
        _, n_vis, n_leaf = st
        if DEBUG_COUNTERS:
            riota = jax.lax.broadcasted_iota(
                jnp.int32, (rows, TILE_LANES), 0)
            cnt_ref[:, :] = jnp.where(
                riota == 0, n_vis,
                jnp.where(riota == 1, n_leaf, 0))

    return kernel


def group_ray_bounds(ox, oy, oz, dx, dy, dz, tmax, n_tiles: int,
                     rows: int = 0):
    """Per-(tile, 8-row group) conservative interval bounds, computed
    in plain XLA (one fused pass over the ray planes) and DMA'd into
    the kernel as a (n_tiles, 32, 128) block.

    Bounds are SIGN-CLASS SPLIT per axis: rows a*8 + c*4 .. +3 hold
    (inv_lo, inv_hi, o_inv_lo, o_inv_hi) for axis a over the group's
    rays whose d[a] is >= 0 (c=0) / < 0 (c=1); row 24 is the group
    t-limit.  Mixed-sign groups (shadow fans to a point light) make
    single-interval 1/d bounds span +-1e20 and the products meaningless
    (measured 2.6x shadow-pass blowup); per-class intervals stay tight
    and the kernel unions the resulting CHILD intervals, which is still
    conservative for every ray (each ray's slab interval is inside its
    class interval).  An empty class borrows the other class's bounds
    so its products stay finite.  Dead rays (t_max < 0) are excluded."""
    ng = (rows or TILE_ROWS) // 8
    tiny = jnp.float32(1e-20)

    def inv(c):
        safe = jnp.where(jnp.abs(c) < tiny,
                         jnp.where(c < 0, -tiny, tiny), c)
        return 1.0 / safe

    dead = tmax < 0.0
    grp = lambda q: q.reshape(n_tiles, ng, 8, TILE_LANES)
    deadg = grp(dead)
    rows_out = []
    for o_a, d_a in ((ox, dx), (oy, dy), (oz, dz)):
        iv = inv(d_a)
        oiv = o_a * iv
        ivg, oivg = grp(iv), grp(oiv)
        pos = grp(d_a >= 0)
        cls_bounds = []
        for c in range(2):
            m = (pos if c == 0 else ~pos) & ~deadg
            some = jnp.any(m, axis=(2, 3), keepdims=True)  # (nt,ng,1,1)
            il = jnp.min(jnp.where(m, ivg, 1e32), axis=(2, 3))
            ih = jnp.max(jnp.where(m, ivg, -1e32), axis=(2, 3))
            ol = jnp.min(jnp.where(m, oivg, 1e32), axis=(2, 3))
            oh = jnp.max(jnp.where(m, oivg, -1e32), axis=(2, 3))
            cls_bounds.append((some[..., 0, 0], il, ih, ol, oh))
        # An empty class borrows the other's bounds (keeps the union
        # equal to the live class; avoids inf/NaN products in-kernel).
        for c in range(2):
            some, il, ih, ol, oh = cls_bounds[c]
            osome, oil, oih, ool, ooh = cls_bounds[1 - c]
            il = jnp.where(some, il, jnp.where(osome, oil, 1.0))
            ih = jnp.where(some, ih, jnp.where(osome, oih, 1.0))
            ol = jnp.where(some, ol, jnp.where(osome, ool, 0.0))
            oh = jnp.where(some, oh, jnp.where(osome, ooh, 0.0))
            rows_out += [il, ih, ol, oh]
    tlim = jnp.max(grp(tmax), axis=(2, 3))               # (n_tiles, ng)
    bnd = jnp.stack(rows_out + [tlim], axis=1)           # (nt, 25, ng)
    bnd = jnp.pad(bnd, ((0, 0), (0, 7), (0, TILE_LANES - ng)),
                  constant_values=-1.0)
    return bnd                                           # (nt, 32, 128)


def trace_tiles_wide8(ox, oy, oz, dx, dy, dz, tmax, records, flat_tris,
                      nw: int, leaf_size: int, t_min: float,
                      find_closest: bool, leaf_base: bool = False,
                      rows: int = 0):
    """Run the wide8 kernel over all ray tiles ((R, 128) planes in,
    (t, tri, u, v) planes out — same contract as tp._trace_tiles).

    Node-test mode (see _make_kernel): exact per-ray tests by default —
    they win BOTH passes on the bench scene (closest 1.53 ms vs 1.83
    interval / 2.55 classic; shadow 1.77 vs 6.7 interval / 2.33
    classic; visits ~9-10/tile at classic-level leaf work).  Override
    with HRT_W8_EXACT=all|shadow|off (read eagerly, outside the jit).
    leaf_base mode (HRT_W8_LB=1, requires reorder-built records /
    Accel.w8_lb) trades one crossing per hit leaf CHILD for one per
    leaf VISIT with a UNION group mask — measured LOSS on the bench
    scene (closest 0.501 vs 0.462 ms, shadow 0.524 vs 0.489, stable
    across interleaved repeats): typical visits hit ~1 leaf child, so
    there is no crossing to save and the union's over-tested groups
    pay K extra Moller rounds.  Default OFF; kept as a probe."""
    mode = _os.environ.get("HRT_W8_EXACT", "all")
    exact = {"all": True, "off": False}.get(mode, not find_closest)
    # leaf_base arg = "records are reorder-built" (accel.w8_lb).  On
    # such records the PACKED leaf-crossing scheme (<= 3 crossings per
    # leaf visit, exact per-child masks) is the default; HRT_W8_PACK=0
    # reverts to one crossing per hit child, HRT_W8_LB=1 to the union-
    # mask probe (one crossing per visit, over-tested groups).
    union = leaf_base and bool(int(_os.environ.get("HRT_W8_LB", "0")))
    pack = (leaf_base and not union
            and bool(int(_os.environ.get("HRT_W8_PACK", "1"))))
    guards = bool(int(_os.environ.get("HRT_KERNEL_GUARDS", "0")))
    out = _trace_tiles_wide8(ox, oy, oz, dx, dy, dz, tmax, records,
                             flat_tris, nw=nw, leaf_size=leaf_size,
                             t_min=t_min, find_closest=find_closest,
                             exact=exact, leaf_base=union, pack=pack,
                             guards=guards, rows=rows or TILE_ROWS)
    if guards:
        from jax.experimental import io_callback

        out, viol = out[:-1], out[-1]
        # The callback only RECORDS violations (module-global list);
        # raising from inside a callback surfaces nondeterministically
        # (the error rides whatever buffer/token the runtime pins it
        # to — ordered mode even poisons the process-global token so
        # later errors slip one computation late).  Callers raise via
        # check_pending_guards() after a block_until_ready — any op
        # inside the computation is guaranteed done by then.
        io_callback(_record_guards, jax.ShapeDtypeStruct((), jnp.int32),
                    viol, ordered=False)
    return out


_pending_violations: list = []


def _record_guards(viol):
    import numpy as np

    v = np.asarray(viol)
    if v.any():
        _pending_violations.append(v.copy())
    return np.int32(0)


def check_pending_guards():
    """Raise if any HRT_KERNEL_GUARDS=1 kernel launch recorded index
    violations since the last check.  Call after jax.block_until_ready
    on the launch's outputs.  Bit 1: wide-node id out of range; bit 2:
    traversal stack overflow; bit 4: leaf tri_start out of the
    triangle pool."""
    import numpy as np

    if not _pending_violations:
        return
    vs = _pending_violations[:]
    _pending_violations.clear()
    bits = int(np.bitwise_or.reduce(
        np.concatenate([v.ravel() for v in vs])))
    tiles = sorted({int(t) for v in vs for t in np.nonzero(v)[0]})
    raise RuntimeError(
        f"wide8 kernel guard violation (mask {bits:#x}: "
        f"{'node-id ' if bits & 1 else ''}"
        f"{'stack-overflow ' if bits & 2 else ''}"
        f"{'leaf-start ' if bits & 4 else ''}) in tiles {tiles[:8]}"
        " — corrupted records or kernel bug; the indices were "
        "clamped, results are unreliable")


@functools.partial(jax.jit,
                   static_argnames=("nw", "leaf_size", "t_min",
                                    "find_closest", "exact",
                                    "leaf_base", "pack", "guards",
                                    "rows"))
def _trace_tiles_wide8(ox, oy, oz, dx, dy, dz, tmax, records, flat_tris,
                       nw: int, leaf_size: int, t_min: float,
                       find_closest: bool, exact: bool,
                       leaf_base: bool = False, pack: bool = False,
                       guards: bool = False, rows: int = 0):
    rows = rows or TILE_ROWS
    total_rows = ox.shape[0]
    n_tiles = total_rows // rows
    assert n_tiles * rows == total_rows, (total_rows, rows)
    bnd = group_ray_bounds(ox, oy, oz, dx, dy, dz, tmax, n_tiles,
                           rows=rows)
    tris_in_vmem = (records.size + flat_tris.size) <= tp.MAX_VMEM_F32

    kernel = _make_kernel(nw, leaf_size, t_min, find_closest,
                          tris_in_vmem=tris_in_vmem, exact=exact,
                          leaf_base=leaf_base, pack=pack, guards=guards,
                          n_tri_lanes=flat_tris.shape[0] * TILE_LANES,
                          rows=rows)
    ray_spec = pl.BlockSpec((rows, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((1, 32, TILE_LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = (vmem_spec if tris_in_vmem
                else pl.BlockSpec(memory_space=pl.ANY))
    scratch_shapes = [] if tris_in_vmem else [
        pltpu.VMEM((1, 16, TILE_LANES), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    scratch_shapes += [
        pltpu.VMEM((1, TILE_LANES), jnp.float32),   # per-group tlim
        pltpu.SMEM((1,), jnp.int32),                # shadow done flag
        pltpu.SMEM((STACK,), jnp.int32),            # traversal stack
    ]
    assert records.dtype == jnp.int32, "wide8 records must be i32"
    out_shape = [
        jax.ShapeDtypeStruct((total_rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, TILE_LANES), jnp.int32),
        jax.ShapeDtypeStruct((total_rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, TILE_LANES), jnp.float32),
    ]
    out_specs = [ray_spec] * 4
    if DEBUG_COUNTERS:
        out_shape.append(
            jax.ShapeDtypeStruct((total_rows, TILE_LANES), jnp.int32))
        out_specs.append(ray_spec)
    if guards:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles,), jnp.int32))
        out_specs.append(pl.BlockSpec((1,), lambda i: (i,),
                                      memory_space=pltpu.SMEM))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 7 + [bnd_spec, vmem_spec, tri_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(jax.default_backend() == "cpu"),
    )(ox, oy, oz, dx, dy, dz, tmax, bnd, records, flat_tris)
    return tuple(out)
