"""Ray-triangle and ray-AABB intersection, vectorized for the VPU.

This is our replacement for the GPU RT cores the reference leans on
(`TraceRay`, ref: shaders/raytracing.slang:67,121 — the driver does
Möller-Trumbore + BVH traversal in hardware).  Everything here is
branch-free element-wise math over SoA batches.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .math3d import cross, dot

INF = np.float32(1e32)  # ref: shaders/constants.slang:3 (INFINITE)
TMIN = np.float32(1e-3)  # ref: raytracing.slang:105 (ray.TMin)
_DET_EPS = np.float32(1e-12)


def moller_trumbore(ray_o, ray_d, v0, e1, e2, t_min, t_max):
    """Batched Möller-Trumbore.

    All arguments broadcast elementwise over a common batch shape with a
    trailing axis of 3 (t_min/t_max without it).  Returns
    (hit_mask, t, u, v) of the broadcast batch shape.  Degenerate
    triangles (e1 x e2 parallel to nothing, det ~ 0) never hit, which is
    what makes zero-padding of the triangle pool safe.
    """
    pvec = cross(ray_d, e2)
    det = dot(e1, pvec)
    # No culling: the reference traces with no backface flags.
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = ray_o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(ray_d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def ray_aabb(ray_o, inv_d, box_min, box_max, t_min, t_max):
    """Branch-free slab test.

    inv_d = 1/ray_d precomputed (with +/-inf for zero components, which
    the min/max formulation handles).  Returns (hit_mask, t_entry).
    """
    t0 = (box_min - ray_o) * inv_d
    t1 = (box_max - ray_o) * inv_d
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    entry = jnp.maximum(jnp.max(t_near, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(t_far, axis=-1), t_max)
    return entry <= exit_, entry


def safe_inv_dir(ray_d: jnp.ndarray) -> jnp.ndarray:
    """1/d with tiny components clamped so slab tests stay finite-safe."""
    tiny = jnp.float32(1e-20)
    d = jnp.where(jnp.abs(ray_d) < tiny,
                  jnp.where(ray_d < 0, -tiny, tiny), ray_d)
    return 1.0 / d


def pick_chunk(t_total: int, want: int) -> int:
    """Largest power-of-two-ish chunk dividing the (padded) pool size."""
    for c in (want, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if c <= want and t_total % c == 0:
            return c
    return 1


def closest_hit_bruteforce(ray_o, ray_d, tri_v0, tri_e1, tri_e2,
                           t_min=TMIN, t_max=INF, chunk: int = 512):
    """O(rays x tris) closest hit — the oracle + small-scene fast path.

    ray_o/ray_d: (N, 3); tri_*: (T, 3).  Returns (t (N,), tri_idx (N,) i32
    [-1 = miss], u (N,), v (N,)).  Scans triangle chunks to bound the
    (N, chunk) intermediate, keeping VMEM pressure flat while XLA fuses
    the whole chunk loop into vector code.
    """
    n = ray_o.shape[0]
    t_total = tri_v0.shape[0]
    chunk = pick_chunk(t_total, min(chunk, t_total))

    import jax

    def body(carry, tri_chunk):
        best_t, best_i, best_u, best_v, base = carry
        v0, e1, e2 = tri_chunk
        hit, t, u, v = moller_trumbore(
            ray_o[:, None, :], ray_d[:, None, :],
            v0[None], e1[None], e2[None],
            t_min, best_t[:, None],
        )
        t = jnp.where(hit, t, INF)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        improved = tj < best_t
        take = lambda arr: jnp.take_along_axis(arr, j[:, None], axis=1)[:, 0]
        best_i = jnp.where(improved, base + j.astype(jnp.int32), best_i)
        best_u = jnp.where(improved, take(u), best_u)
        best_v = jnp.where(improved, take(v), best_v)
        best_t = jnp.where(improved, tj, best_t)
        return (best_t, best_i, best_u, best_v, base + chunk), None

    v0c = tri_v0.reshape(-1, chunk, 3)
    e1c = tri_e1.reshape(-1, chunk, 3)
    e2c = tri_e2.reshape(-1, chunk, 3)
    init = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.int32(0),
    )
    (best_t, best_i, best_u, best_v, _), _ = jax.lax.scan(
        body, init, (v0c, e1c, e2c))
    return best_t, best_i, best_u, best_v


def any_hit_bruteforce(ray_o, ray_d, tri_v0, tri_e1, tri_e2,
                       t_min=TMIN, t_max=INF, chunk: int = 512):
    """Occlusion query: True where ANY triangle blocks the segment.

    The analogue of RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH shadow rays
    (ref: shaders/raytracing.slang:67).  t_max may be per-ray (N,).
    """
    import jax

    n = ray_o.shape[0]
    t_total = tri_v0.shape[0]
    chunk = pick_chunk(t_total, min(chunk, t_total))
    t_max = jnp.broadcast_to(t_max, (n,))

    def body(carry, tri_chunk):
        occluded = carry
        v0, e1, e2 = tri_chunk
        hit, _, _, _ = moller_trumbore(
            ray_o[:, None, :], ray_d[:, None, :],
            v0[None], e1[None], e2[None],
            t_min, t_max[:, None],
        )
        return occluded | jnp.any(hit, axis=1), None

    v0c = tri_v0.reshape(-1, chunk, 3)
    e1c = tri_e1.reshape(-1, chunk, 3)
    e2c = tri_e2.reshape(-1, chunk, 3)
    occluded, _ = jax.lax.scan(
        body, jnp.zeros((n,), bool), (v0c, e1c, e2c))
    return occluded
