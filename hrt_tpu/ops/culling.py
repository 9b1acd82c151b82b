"""'Smart Culling' — screen-footprint instance culling pre-pass.

Advertised by the reference README ("Smart Culling (v0.2)") with no
implementation anywhere in its code; designed here from the feature's
description: instances whose projected screen footprint is below a
pixel threshold are skipped for the frame, with enter/exit hysteresis
so instances don't pop at the threshold boundary.

TPU-native shape: one vectorized pass over per-instance world AABBs
(project 8 corners -> conservative screen bbox -> area in pixels),
producing a per-triangle mask consumed by the LBVH rebuild
(ops/lbvh.build_bvh(tri_mask=...)).  Cull state is a small pytree.
"""
from __future__ import annotations

import jax.numpy as jnp


def _corners(bmin: jnp.ndarray, bmax: jnp.ndarray) -> jnp.ndarray:
    """(I, 8, 3) corner positions of instance AABBs."""
    picks = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        jnp.float32)
    return (bmin[:, None, :] * (1.0 - picks[None])
            + bmax[:, None, :] * picks[None])


def footprint_px(inst_bmin, inst_bmax, cam, width: int, height: int):
    """Conservative projected footprint area (pixels^2) per instance.

    cam: renderer.CameraArrays.  Instances straddling or behind the
    near plane get +inf footprint (never culled)."""
    pts = _corners(inst_bmin, inst_bmax)          # (I, 8, 3)
    rel = pts - cam.origin
    x = jnp.sum(rel * cam.basis[0], -1)
    y = jnp.sum(rel * cam.basis[1], -1)
    z = jnp.sum(rel * cam.basis[2], -1)
    near = 1e-3
    any_near = jnp.any(z <= near, axis=1)
    zs = jnp.maximum(z, near)
    px = (x / (zs * cam.aspect * cam.tan_half_fovy) + 1.0) * 0.5 * width
    py = (y / (zs * cam.tan_half_fovy) + 1.0) * 0.5 * height
    w = jnp.clip(jnp.max(px, 1), 0, width) - jnp.clip(jnp.min(px, 1), 0,
                                                      width)
    h = jnp.clip(jnp.max(py, 1), 0, height) - jnp.clip(jnp.min(py, 1), 0,
                                                       height)
    area = w * h
    return jnp.where(any_near, jnp.float32(jnp.inf), area)


def cull_instances(visible_prev: jnp.ndarray, inst_bmin, inst_bmax, cam,
                   width: int, height: int, threshold_px: float = 1.0,
                   hysteresis: float = 2.0):
    """Hysteresis update of per-instance visibility.

    Show when footprint > threshold*hysteresis; hide when footprint <
    threshold; keep previous state in between (anti-pop)."""
    area = footprint_px(inst_bmin, inst_bmax, cam, width, height)
    show = area > threshold_px * hysteresis
    hide = area < threshold_px
    return jnp.where(show, True, jnp.where(hide, False, visible_prev))


def triangle_mask(visible: jnp.ndarray, tri_inst: jnp.ndarray,
                  tri_valid: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle keep mask from instance visibility (padding rows
    have tri_inst == -1 and stay masked out)."""
    safe = jnp.maximum(tri_inst, 0)
    vis = visible[safe] & (tri_inst >= 0)
    return vis & (tri_valid > 0.5)
