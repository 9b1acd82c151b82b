"""Pure-numpy brute-force reference tracer — the test oracle.

Independent re-derivation (no JAX) of closest-hit / any-hit used to
validate every accelerated path: brute-force jnp intersectors, the LBVH
traversal, and the Pallas kernels.  O(rays x tris), double precision.
"""
from __future__ import annotations

import numpy as np


def closest_hit(ray_o: np.ndarray, ray_d: np.ndarray, v0: np.ndarray,
                e1: np.ndarray, e2: np.ndarray, t_min: float = 1e-3,
                t_max: float = 1e32):
    """Returns (t, idx, u, v) with idx=-1 for misses. float64 math."""
    ray_o = np.asarray(ray_o, np.float64)
    ray_d = np.asarray(ray_d, np.float64)
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    n = ray_o.shape[0]
    best_t = np.full(n, t_max)
    best_i = np.full(n, -1, np.int64)
    best_u = np.zeros(n)
    best_v = np.zeros(n)
    for i in range(v0.shape[0]):
        pvec = np.cross(ray_d, e2[i])
        det = pvec @ e1[i]
        ok = np.abs(det) > 1e-12
        inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = ray_o - v0[i]
        u = np.sum(tvec * pvec, -1) * inv_det
        qvec = np.cross(tvec, e1[i])
        v = np.sum(ray_d * qvec, -1) * inv_det
        t = np.sum(qvec * e2[i], -1) * inv_det
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_i = np.where(hit, i, best_i)
        best_u = np.where(hit, u, best_u)
        best_v = np.where(hit, v, best_v)
    return best_t, best_i, best_u, best_v


def any_hit(ray_o: np.ndarray, ray_d: np.ndarray, v0: np.ndarray,
            e1: np.ndarray, e2: np.ndarray, t_min: float = 1e-3,
            t_max=1e32) -> np.ndarray:
    ray_o = np.asarray(ray_o, np.float64)
    ray_d = np.asarray(ray_d, np.float64)
    n = ray_o.shape[0]
    t_max = np.broadcast_to(np.asarray(t_max, np.float64), (n,))
    occluded = np.zeros(n, bool)
    for i in range(v0.shape[0]):
        pvec = np.cross(ray_d, np.asarray(e2[i], np.float64))
        det = pvec @ np.asarray(e1[i], np.float64)
        ok = np.abs(det) > 1e-12
        inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = ray_o - np.asarray(v0[i], np.float64)
        u = np.sum(tvec * pvec, -1) * inv_det
        qvec = np.cross(tvec, np.asarray(e1[i], np.float64))
        v = np.sum(ray_d * qvec, -1) * inv_det
        t = np.sum(qvec * np.asarray(e2[i], np.float64), -1) * inv_det
        occluded |= ok & (u >= 0) & (v >= 0) & (u + v <= 1) & \
            (t > t_min) & (t < t_max)
    return occluded
