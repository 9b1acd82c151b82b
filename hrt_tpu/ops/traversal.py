"""BVH traversal in pure JAX: vectorized per-ray stack machines.

This is the software replacement for the reference's hardware
`TraceRay` (ref: shaders/raytracing.slang:67,121 — BVH walk + triangle
tests happen in the GPU's RT cores).  Expressed as one `lax.while_loop`
over the whole ray batch: every ray carries its own traversal stack and
all rays advance one node per iteration (masked, branch-free).  Gathers
make this the *fallback* path — the Pallas packet kernel
(traversal_pallas.py) is the fast path on TPU; this version is the
oracle-checked reference and the CPU/test backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .intersect import INF, moller_trumbore, ray_aabb, safe_inv_dir
from .lbvh import BVH

STACK_DEPTH = 64


@functools.partial(jax.jit, static_argnames=("find_closest", "k"))
def _traverse(bvh: BVH, o, d, t_min, t_max, find_closest: bool,
              k: int = 8):
    """Shared stack-machine loop.

    Returns (t, leaf_tri (sorted-pool id, -1 = miss), u, v, occluded).
    For find_closest=False, stops a ray as soon as any hit is found.
    `k` = leaf capacity (static; from Accel.leaf_size).
    """
    n = o.shape[0]
    ni = bvh.num_internal
    ar = jnp.arange(n)
    inv_d = safe_inv_dir(d)
    t_max = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    t_min = jnp.asarray(t_min, jnp.float32)

    stack0 = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    sp0 = jnp.ones((n,), jnp.int32)  # root (internal 0) pre-pushed
    best_t0 = t_max
    best_i0 = jnp.full((n,), -1, jnp.int32)
    uv0 = jnp.zeros((n, 2), jnp.float32)
    occ0 = jnp.zeros((n,), bool)

    def cond(state):
        sp = state[1]
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_i, uv, occ = state
        has = sp > 0
        top = jnp.clip(sp - 1, 0, STACK_DEPTH - 1)
        e = jnp.where(has, stack[ar, top], 0)
        sp = sp - has.astype(jnp.int32)

        internal = has & (e >= 0)
        leaf = has & (e < 0)
        nid = jnp.clip(e, 0, ni - 1)

        # --- internal: slab-test both children, push far-then-near ----
        hit_l, t_l = ray_aabb(o, inv_d, bvh.bmin_l[nid], bvh.bmax_l[nid],
                              t_min, best_t)
        hit_r, t_r = ray_aabb(o, inv_d, bvh.bmin_r[nid], bvh.bmax_r[nid],
                              t_min, best_t)
        hit_l = hit_l & internal
        hit_r = hit_r & internal
        el = bvh.child_l[nid]
        er = bvh.child_r[nid]
        r_near = t_r < t_l
        far_e = jnp.where(r_near, el, er)
        near_e = jnp.where(r_near, er, el)
        push_far = jnp.where(r_near, hit_l, hit_r)
        push_near = jnp.where(r_near, hit_r, hit_l)

        idx1 = jnp.where(push_far, sp, STACK_DEPTH)  # OOB -> dropped
        stack = stack.at[ar, idx1].set(far_e, mode="drop")
        sp = sp + push_far.astype(jnp.int32)
        idx2 = jnp.where(push_near, sp, STACK_DEPTH)
        stack = stack.at[ar, idx2].set(near_e, mode="drop")
        sp = sp + push_near.astype(jnp.int32)

        # --- leaf: Moller-Trumbore over the K-triangle block ----------
        lidx = jnp.clip(-(e + 1), 0, bvh.tri_v0.shape[0] // k - 1)
        base = lidx * k
        tri_ids = base[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        v0 = bvh.tri_v0[tri_ids]
        e1 = bvh.tri_e1[tri_ids]
        e2 = bvh.tri_e2[tri_ids]
        hit, t, u, v = moller_trumbore(
            o[:, None, :], d[:, None, :], v0, e1, e2,
            t_min, best_t[:, None])
        hit = hit & leaf[:, None]
        t = jnp.where(hit, t, INF)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
        improved = tj < best_t
        if find_closest:
            best_t = jnp.where(improved, tj, best_t)
            best_i = jnp.where(improved,
                               jnp.take_along_axis(tri_ids, j[:, None], 1)
                               [:, 0], best_i)
            uj = jnp.take_along_axis(u, j[:, None], 1)[:, 0]
            vj = jnp.take_along_axis(v, j[:, None], 1)[:, 0]
            uv = jnp.where(improved[:, None],
                           jnp.stack([uj, vj], -1), uv)
        else:
            occ = occ | jnp.any(hit, axis=1)
            sp = jnp.where(occ, 0, sp)  # early out
        return stack, sp, best_t, best_i, uv, occ

    state = (stack0, sp0, best_t0, best_i0, uv0, occ0)
    _, _, best_t, best_i, uv, occ = jax.lax.while_loop(cond, body, state)
    return best_t, best_i, uv[:, 0], uv[:, 1], occ


def _unwrap(accel):
    """Historical shim: rounds 1-2 wrapped accels in a WideAccel for
    the (since-culled) masked-stack wide kernel.  Plain Accels pass
    through; anything carrying a .base attribute unwraps to it."""
    return getattr(accel, "base", accel), None


def closest_hit_bvh(scene, accel, o, d, t_min, t_max,
                    use_pallas: bool = False, sorted_ids: bool = False):
    """Closest hit via BVH; returns (t, tri_id, u, v) matching the
    brute-force signature (renderer.trace_closest).  The Pallas path
    prefers the sublane-record BVH8 kernel when the accel carries a
    wide8 table (see traversal_pallas.use_wide8).

    sorted_ids=True returns ids in the BVH leaf-pool order (for
    Accel.attr shading) instead of original triangle ids."""
    base, wide = _unwrap(accel)
    if use_pallas:
        from . import traversal_pallas

        if traversal_pallas.available():
            return traversal_pallas.closest_hit(scene, base, o, d,
                                                t_min, t_max,
                                                sorted_ids=sorted_ids)
    tree = base.tree
    t, i_sorted, u, v, _ = _traverse(tree, o, d, t_min, t_max, True,
                                     k=base.leaf_size)
    if sorted_ids:
        return t, i_sorted, u, v
    tri = jnp.where(i_sorted >= 0,
                    tree.tri_perm[jnp.maximum(i_sorted, 0)], -1)
    return t, tri, u, v


def closest_hit_bvh_p(scene, accel, o, d, t_min, t_max,
                      use_pallas: bool = False,
                      sorted_ids: bool = False):
    """Planar closest_hit_bvh: o/d are V3s (ops/v3.py).  Non-Pallas
    fallbacks stack to arrays (only the slow/oracle paths pay that)."""
    base, wide = _unwrap(accel)
    if use_pallas:
        from . import traversal_pallas

        if traversal_pallas.available():
            return traversal_pallas.closest_hit_p(
                scene, base, o, d, t_min, t_max, sorted_ids=sorted_ids)
    return closest_hit_bvh(scene, base, o.to_array(), d.to_array(),
                           t_min, t_max, use_pallas=False,
                           sorted_ids=sorted_ids)


def any_hit_bvh_p(scene, accel, o, d, t_min, t_max,
                  use_pallas: bool = False):
    """Planar any_hit_bvh (V3 in, bool (N,) out)."""
    base, wide = _unwrap(accel)
    if use_pallas:
        from . import traversal_pallas

        if traversal_pallas.available():
            return traversal_pallas.any_hit_p(scene, base, o, d,
                                              t_min, t_max)
    return any_hit_bvh(scene, base, o.to_array(), d.to_array(), t_min,
                       t_max, use_pallas=False)


def any_hit_bvh(scene, accel, o, d, t_min, t_max,
                use_pallas: bool = False):
    """Occlusion query via BVH (shadow rays); returns bool (N,)."""
    base, wide = _unwrap(accel)
    if use_pallas:
        from . import traversal_pallas

        if traversal_pallas.available():
            return traversal_pallas.any_hit(scene, base, o, d,
                                            t_min, t_max)
    _, _, _, _, occ = _traverse(base.tree, o, d, t_min, t_max, False,
                                k=base.leaf_size)
    return occ
