"""Camera: perspective projection + Euler-YXZ view, reference conventions.

The reference world is Y-down (camera `upDir = (0,-1,0)`,
ref: Graphics/Camera.cpp:44; OBJ loader negates Y on load,
ref: Graphics/RayTracing/Scene.cpp:49).  The projection is Vulkan-style
depth 0..1 (ref: Graphics/Camera.cpp:8-17); the view is a Euler-YXZ
rotation (ref: Graphics/Camera.cpp:71-95).  The shaders consume
`inverse(transpose(view/proj))` with Slang's row-vector `mul`
(ref: RTApp.cpp:45-46, shaders/raytracing.slang:100-107), which cancels
to plain column-vector `P^-1` / `V^-1`; primary-ray generation below is
the closed form of that algebra, so images match the reference exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..ops.math3d import normalize


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pure-data camera; all methods return new arrays (functional)."""

    position: Tuple[float, float, float] = (0.0, 0.0, -2.0)
    rotation: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # Euler (x,y,z)
    fov_y: float = 1.0471975512  # ~60deg, ref: RTApp.cpp:41 glm::radians(60.f)
    z_near: float = 0.1
    z_far: float = 100.0

    def basis(self) -> jnp.ndarray:
        """Rows (u, v, w) of the view rotation = camera right/up/forward.

        Euler-YXZ composition exactly as Camera::updateView
        (ref: Graphics/Camera.cpp:71-95).
        """
        rx, ry, rz = self.rotation
        c3, s3 = jnp.cos(rz), jnp.sin(rz)
        c2, s2 = jnp.cos(rx), jnp.sin(rx)
        c1, s1 = jnp.cos(ry), jnp.sin(ry)
        u = jnp.stack([c1 * c3 + s1 * s2 * s3, c2 * s3, c1 * s2 * s3 - c3 * s1])
        v = jnp.stack([c3 * s1 * s2 - c1 * s3, c2 * c3, c1 * c3 * s2 + s1 * s3])
        w = jnp.stack([c2 * s1, -s2, c1 * c2])
        return jnp.stack([u, v, w]).astype(jnp.float32)

    def ray_params(self, width: int, height: int):
        """(origin, basis, tan_half_fovy, aspect) for ray generation."""
        aspect = width / height
        tan_half = jnp.float32(jnp.tan(self.fov_y / 2.0))
        origin = jnp.asarray(self.position, jnp.float32)
        return origin, self.basis(), tan_half, jnp.float32(aspect)


def primary_rays(
    origin: jnp.ndarray,
    basis: jnp.ndarray,
    tan_half_fovy: jnp.ndarray,
    aspect: jnp.ndarray,
    width: int,
    height: int,
    jitter: jnp.ndarray | None = None,
    y0=0,
    rows: int | None = None,
):
    """Generate per-pixel primary rays, matching rgenMain's algebra.

    clipCoords = launchID / launchSize * 2 - 1 (the reference uses the
    raw launch id, NOT the jittered pixel center — a quirk we keep when
    `jitter is None`; ref: shaders/raytracing.slang:97-100).  With the
    projection of Camera.cpp:8-17, `P^-1 @ (cx, cy, 1, 1)` has
    xyz = (aspect*tan*cx, tan*cy, 1), so the camera-space direction is
    that, normalized, rotated into world by the transposed view rotation.

    `y0`/`rows` select a horizontal band of the image (for tile-parallel
    rendering over a device mesh); y0 may be a traced value.
    Returns (origins (rows,W,3), directions (rows,W,3)).
    """
    if rows is None:
        rows = height
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = (jnp.asarray(y0, jnp.float32)
          + jnp.arange(rows, dtype=jnp.float32))[:, None]
    if jitter is not None:
        px = px + jitter[..., 0]
        py = py + jitter[..., 1]
    cx = px / jnp.float32(width) * 2.0 - 1.0
    cy = py / jnp.float32(height) * 2.0 - 1.0
    dir_cam = jnp.stack(
        jnp.broadcast_arrays(
            aspect * tan_half_fovy * cx, tan_half_fovy * cy,
            jnp.float32(1.0),
        ),
        axis=-1,
    )
    dir_cam = normalize(dir_cam)
    # world dir = V^-1 @ (d, 0) = d.x*u + d.y*v + d.z*w (basis rows u,v,w).
    # Explicit mul-add: full f32 on the VPU (einsum would hit bf16 MXU).
    dirs = (
        dir_cam[..., 0:1] * basis[0]
        + dir_cam[..., 1:2] * basis[1]
        + dir_cam[..., 2:3] * basis[2]
    )
    origins = jnp.broadcast_to(origin, dirs.shape)
    return origins, dirs


def primary_rays_from_px_p(
    origin: jnp.ndarray,
    basis: jnp.ndarray,
    tan_half_fovy: jnp.ndarray,
    aspect: jnp.ndarray,
    width: int,
    height: int,
    px: jnp.ndarray,
    py: jnp.ndarray,
):
    """Primary rays from explicit (jittered) pixel-coordinate planes of
    ANY shape — the blocked-order fast path: the renderer reorders only
    the px/py index planes into traversal-block order and generates
    o/d/seeds directly in that order, instead of paying a 6-D transpose
    per ray plane (measured ~0.34 ms/frame of relayout fusions)."""
    from ..ops.v3 import V3

    cx = px / jnp.float32(width) * 2.0 - 1.0
    cy = py / jnp.float32(height) * 2.0 - 1.0
    dcx = aspect * tan_half_fovy * cx
    dcy = tan_half_fovy * cy
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(dcx * dcx + dcy * dcy + 1.0,
                                         1e-16))
    dcx, dcy, dcz = (dcx * inv_len, dcy * inv_len,
                     jnp.broadcast_to(inv_len, px.shape))
    # world dir = d.x*u + d.y*v + d.z*w (basis rows u, v, w).
    dirs = V3(
        dcx * basis[0, 0] + dcy * basis[1, 0] + dcz * basis[2, 0],
        dcx * basis[0, 1] + dcy * basis[1, 1] + dcz * basis[2, 1],
        dcx * basis[0, 2] + dcy * basis[1, 2] + dcz * basis[2, 2],
    )
    ones = jnp.ones(px.shape, jnp.float32)
    origins = V3(origin[0] * ones, origin[1] * ones, origin[2] * ones)
    return origins, dirs


def primary_rays_p(
    origin: jnp.ndarray,
    basis: jnp.ndarray,
    tan_half_fovy: jnp.ndarray,
    aspect: jnp.ndarray,
    width: int,
    height: int,
    jitter=None,
    y0=0,
    rows: int | None = None,
):
    """Planar primary_rays: same algebra, V3 outputs with (rows, width)
    planes (see ops/v3.py).  `jitter` is an (jx, jy) tuple of planes
    (not a stacked (..., 2) array)."""
    if rows is None:
        rows = height
    px = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :],
                          (rows, width))
    py = jnp.broadcast_to(
        (jnp.asarray(y0, jnp.float32)
         + jnp.arange(rows, dtype=jnp.float32))[:, None], (rows, width))
    if jitter is not None:
        px = px + jitter[0]
        py = py + jitter[1]
    return primary_rays_from_px_p(origin, basis, tan_half_fovy, aspect,
                                  width, height, px, py)


def orbit_camera(t: float, radius: float = 3.0, height: float = -1.0,
                 target=(0.0, 0.0, 0.0), fov_y: float = 1.0471975512) -> Camera:
    """Scripted orbit path (replaces GLFW WASD input, ref: Camera.cpp:26-61)."""
    import math

    px = target[0] + radius * math.sin(t)
    pz = target[2] - radius * math.cos(t)
    py = height
    # Yaw so the camera looks at the target: forward w = (sin yaw, 0, cos yaw).
    yaw = math.atan2(target[0] - px, target[2] - pz)
    dy = target[1] - py
    d = math.sqrt((target[0] - px) ** 2 + (target[2] - pz) ** 2)
    # forward.y = -sin(pitch) must equal dy/dist (world is y-down).
    pitch = -math.atan2(dy, d)
    return Camera(position=(px, py, pz), rotation=(pitch, yaw, 0.0),
                  fov_y=fov_y)
