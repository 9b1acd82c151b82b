"""Masked stack walk over wide BVHs (ops/wide.py) — implicit
equal-count trees or explicit Karras-collapsed trees, arity 8/16/32.

Each EXPANSION slab-tests all children of a node against the whole ray
tile and records a hit bitmask; the walk then descends mask-bit by
mask-bit with a tiny SMEM stack of (node, mask) entries.  Exact on TPU
(see wide.py STATUS for the two platform bugs diagnosed getting here);
currently at performance parity with the binary skip-walk — both are
bound by per-iteration serial dependency-chain latency (ROADMAP #1).
Opt-in on TPU via HRT_WIDE=1; default on CPU tests.

Shares the leaf machinery (and the leaf-ordered triangle pool) with
ops/traversal_pallas.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traversal_pallas import (BLOCK_ROWS, LEAF_UNROLL, TILE_LANES,
                               TILE_ROWS, _leaf_fetch, _moller,
                               _record_extract, _slab_test, _to_tiles,
                               _tri_vecs, _vmem_ok)
from .wide import ARITY, WideAccel, level_offset

MAX_LEVELS = 9  # 8^9 leaves = plenty
# Mosaic-debug variant: replace lax.cond with unconditional+select.
import os as _os

NO_COND = bool(int(_os.environ.get("HRT_WIDE_NOCOND", "0")))
# Diagnostic: return (root_mask, iterations) in the u/v outputs.
DIAG = bool(int(_os.environ.get("HRT_WIDE_DIAG", "0")))


def _ctz(x):
    """Count trailing zeros of a positive scalar i32."""
    low = x & (-x)
    return 31 - jax.lax.clz(low)


def _make_kernel(levels: int, num_leaves: int, leaf_size: int,
                 t_min: float, find_closest: bool, max_node: int = 0,
                 arity: int = ARITY):
    """levels >= 1: implicit equal-count tree; levels == -1: explicit
    collapsed tree (child ids/leaf codes bitcast in record sublane 6,
    see wide.build_wide_collapsed)."""
    rows = TILE_ROWS
    npr = 128 // arity  # nodes per record row
    explicit = levels < 0
    stack_depth = 26 if explicit else levels + 2
    offsets = ([] if explicit
               else [level_offset(l) for l in range(levels + 1)])

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               recs_ref, metas_ref, tris_ref, t_ref, tri_ref, u_ref,
               v_ref, snode, smask, *dma_scratch):
        tiny = jnp.float32(1e-20)
        tmin = jnp.float32(t_min)

        def inv(c):
            safe = jnp.where(jnp.abs(c) < tiny,
                             jnp.where(c < 0, -tiny, tiny), c)
            return 1.0 / safe

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        oix, oiy, oiz = ox * ix, oy * iy, oz * iz

        def expand(g, best_t):
            """Slab-test the 8 children of internal node g; returns the
            hit bitmask as a scalar.

            The 8 per-child any() reductions are fused into ONE
            log-tree OR fold over a per-lane bitmask plane (rolls are
            cheap vector ops; 8 scalar reductions were the dominant
            per-expansion cost)."""
            g = jnp.clip(g, 0, max_node)
            row = g // npr
            base = (g % npr) * arity
            rec = recs_ref[pl.ds(row, 1)]            # (1, 8, 128)
            plane = jnp.zeros((rows, TILE_LANES), jnp.int32)
            for j in range(arity):
                r = _record_extract(rec, base + j)   # (1, 8, 1)
                box = [r[:, c, :] for c in range(6)]
                hit = _slab_test(box, oix, oiy, oiz, ix, iy, iz,
                                 tmin, best_t)
                plane = plane | (hit.astype(jnp.int32) << j)
            v = plane
            s = TILE_LANES // 2
            while s >= 1:
                v = v | pltpu.roll(v, s, axis=1)
                s //= 2
            s = rows // 2
            while s >= 1:
                v = v | pltpu.roll(v, s, axis=0)
                s //= 2
            ii = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            return jnp.sum(jnp.where((ii == 0) & (jj == 0), v, 0))

        def do_leaf(leaf_idx, args):
            best_t, best_i, bu, bv = args
            start = leaf_idx * leaf_size
            lane0 = start % TILE_LANES
            if dma_scratch:
                rec = _leaf_fetch(tris_ref, start, dma_scratch[0],
                                  dma_scratch[1])
            else:
                rec = _leaf_fetch(tris_ref, start)
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

            return jax.lax.fori_loop(0, leaf_size // unroll, tri_body,
                                     (best_t, best_i, bu, bv))

        best_t0 = tmax_ref[:]
        best_i0 = jnp.full((rows, TILE_LANES), -1, jnp.int32)
        zer = jnp.zeros((rows, TILE_LANES), jnp.float32)

        # Root expansion primes the stack.
        root_mask = expand(0, best_t0)
        snode[0] = jnp.int32(0)          # idx 0, level 0
        smask[0] = root_mask
        sp0 = jnp.where(root_mask != 0, 1, 0).astype(jnp.int32)

        def cond(state):
            sp = state[0]
            alive = sp > 0
            if not find_closest:
                alive = alive & jnp.logical_not(jnp.all(state[2] >= 0))
            return alive

        def _child_meta(g, c):
            """Explicit mode: child c's metadata from node g's meta row
            (a dedicated i32 array — f32 bit-carrying gets denormal
            bit patterns flushed by TPU XLA)."""
            g = jnp.clip(g, 0, max_node)
            row = g // npr
            base = (g % npr) * arity
            metas = metas_ref[pl.ds(row, 1)]          # (1, 1, 128) i32
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TILE_LANES),
                                           2)
            return jnp.sum(jnp.where(idx == base + c, metas, 0))

        def body(state):
            sp, best_t, best_i, bu, bv = state
            top = snode[sp - 1]
            m = smask[sp - 1]
            c = _ctz(m)
            m2 = m & (m - 1)
            smask[sp - 1] = m2
            # Parent slot is reusable once its mask is exhausted.
            slot = jnp.where(m2 == 0, sp - 1, sp)

            if explicit:
                meta = _child_meta(top, c)
                child_is_leaf = meta < 0
                # Clamp: cond branches may be lowered predicated, so the
                # untaken branch's indices must still be in-bounds.
                leaf_idx = jnp.clip(-meta - 1, 0, num_leaves - 1)
                child_node = meta       # wide id when internal
                push_encoding = child_node
            else:
                level = top & 15
                idx = top >> 4
                cidx = idx * ARITY + c
                child_is_leaf = level + 1 == levels
                leaf_idx = jnp.clip(cidx, 0, num_leaves - 1)
                off = jnp.int32(0)
                for l in range(1, levels):
                    off = jnp.where(level + 1 == l,
                                    jnp.int32(offsets[l]), off)
                child_node = off + cidx
                push_encoding = (cidx << 4) | (level + 1)

            if explicit:
                # Guard: only expand genuine internal children (meta > 0
                # — an empty slot's bit can never be set, but belt and
                # braces against sentinel-box regressions).
                do_expand = jnp.logical_not(child_is_leaf) & (meta > 0)
            else:
                do_expand = jnp.logical_not(child_is_leaf)

            if NO_COND:
                # Unconditional compute + select (Mosaic-debug variant).
                lt, li, lu, lv = do_leaf(leaf_idx,
                                         (best_t, best_i, bu, bv))
                keep = child_is_leaf
                best_t = jnp.where(keep, lt, best_t)
                best_i = jnp.where(keep, li, best_i)
                bu = jnp.where(keep, lu, bu)
                bv = jnp.where(keep, lv, bv)
                cmask = jnp.where(
                    do_expand,
                    expand(jnp.maximum(child_node, 0), best_t),
                    jnp.int32(0))
            else:
                def leaf_branch(args):
                    return do_leaf(leaf_idx, args)

                best_t, best_i, bu, bv = jax.lax.cond(
                    child_is_leaf, leaf_branch, lambda a: a,
                    (best_t, best_i, bu, bv))

                cmask = jax.lax.cond(
                    do_expand,
                    lambda _: expand(jnp.maximum(child_node, 0), best_t),
                    lambda _: jnp.int32(0),
                    jnp.int32(0))

            push = cmask != 0
            snode[slot] = jnp.where(push, push_encoding, snode[slot])
            smask[slot] = jnp.where(push, cmask, smask[slot])
            sp = jnp.where(push, slot + 1, slot)
            return sp, best_t, best_i, bu, bv

        state = (sp0, best_t0, best_i0, zer, zer)
        if DIAG:
            # Bound iterations + count them.
            def cond_d(st):
                return cond(st[:5]) & (st[5] < 100000)

            def body_d(st):
                out = body(st[:5])
                return out + (st[5] + 1,)

            *out, iters = jax.lax.while_loop(
                cond_d, body_d, state + (jnp.int32(0),))
            _, best_t, best_i, bu, bv = out
            diag0 = (_child_meta(jnp.int32(0), jnp.int32(0))
                     if explicit else root_mask)
            bu = jnp.full((rows, TILE_LANES), 1.0) * diag0.astype(
                jnp.float32)
            bv = jnp.full((rows, TILE_LANES), 1.0) * iters.astype(
                jnp.float32)
        else:
            _, best_t, best_i, bu, bv = jax.lax.while_loop(
                cond, body, state)
        t_ref[:] = best_t
        tri_ref[:] = best_i
        u_ref[:] = bu
        v_ref[:] = bv

    return kernel, stack_depth


@functools.partial(jax.jit,
                   static_argnames=("levels", "num_leaves", "leaf_size",
                                    "t_min", "find_closest", "arity"))
def _trace_tiles(ox, oy, oz, dx, dy, dz, tmax, records, metas,
                 flat_tris, levels: int, num_leaves: int, leaf_size: int,
                 t_min: float, find_closest: bool, arity: int = 8):
    rows = ox.shape[0]
    assert TILE_ROWS == BLOCK_ROWS, \
        "wide kernel does not support HRT_WALKS > 1"
    n_tiles = rows // TILE_ROWS
    kernel, stack_depth = _make_kernel(
        levels, num_leaves, leaf_size, t_min, find_closest,
        max_node=records.shape[0] * (128 // arity) - 1, arity=arity)
    tris_in_vmem = (records.size + flat_tris.size) <= 3_000_000

    ray_spec = pl.BlockSpec((TILE_ROWS, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = vmem_spec if tris_in_vmem else pl.BlockSpec(
        memory_space=pltpu.ANY)
    scratch = [
        pltpu.SMEM((stack_depth,), jnp.int32),
        pltpu.SMEM((stack_depth,), jnp.int32),
    ]
    if not tris_in_vmem:
        scratch += [pltpu.VMEM((1, 16, TILE_LANES), jnp.float32),
                    pltpu.SemaphoreType.DMA(())]
    out_shape = [
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 7 + [vmem_spec, vmem_spec, tri_spec],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=(jax.default_backend() == "cpu"),
    )(ox, oy, oz, dx, dy, dz, tmax, records, metas, flat_tris)


def _run(waccel: WideAccel, o, d, t_min, t_max, find_closest: bool):
    n = o.shape[0]
    quantum = TILE_ROWS * TILE_LANES
    n_pad = ((n + quantum - 1) // quantum) * quantum
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    comps = [_to_tiles(o[:, 0], n_pad), _to_tiles(o[:, 1], n_pad),
             _to_tiles(o[:, 2], n_pad), _to_tiles(d[:, 0], n_pad),
             _to_tiles(d[:, 1], n_pad), _to_tiles(d[:, 2], n_pad),
             _to_tiles(tmax, n_pad, fill=-1.0)]
    t, tri, u, v = _trace_tiles(
        *comps, waccel.wide.records, waccel.wide.meta,
        waccel.base.flat.tris,
        levels=waccel.levels, num_leaves=waccel.num_leaves,
        leaf_size=waccel.base.leaf_size, t_min=float(t_min),
        find_closest=find_closest, arity=waccel.arity)
    out = lambda a: a.reshape(-1)[:n]
    return out(t), out(tri), out(u), out(v)


def closest_hit(scene, waccel: WideAccel, o, d, t_min, t_max,
                sorted_ids: bool = False):
    t, tri_sorted, u, v = _run(waccel, o, d, t_min, t_max, True)
    if sorted_ids:
        return t, tri_sorted, u, v
    tri = jnp.where(tri_sorted >= 0,
                    waccel.base.tree.tri_perm[jnp.maximum(tri_sorted, 0)],
                    -1)
    return t, tri, u, v


def any_hit(scene, waccel: WideAccel, o, d, t_min, t_max):
    _, tri_sorted, _, _ = _run(waccel, o, d, t_min, t_max, False)
    return tri_sorted >= 0
