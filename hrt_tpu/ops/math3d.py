"""Vector math primitives shared by all kernels.

All functions are shape-polymorphic over leading batch dimensions and
operate on float32 arrays whose last axis is the vector axis (size 3).
This is the JAX equivalent of the reference's shader math library
(ref: shaders/shadermath.slang:3-30); the buggy duplicate basis in
shaders/pbr.slang:36-47 is intentionally NOT reproduced.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def dotk(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product, keepdims=True (broadcast-friendly)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3D cross product (manual — jnp.cross is slower on TPU)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    return a * jnp.reciprocal(jnp.sqrt(jnp.maximum(dotk(a, a), eps)))


def square(x: jnp.ndarray) -> jnp.ndarray:
    """ref: shaders/shadermath.slang:3."""
    return x * x


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """HLSL/Slang `reflect`: v - 2*dot(v,n)*n (v points toward surface)."""
    return v - 2.0 * dotk(v, n) * n


def orthonormal_basis(normal: jnp.ndarray):
    """Branch-free orthonormal basis around `normal`.

    Frisvad-style construction with the z < -1 guard expressed as a
    select so it vectorizes (ref: shaders/shadermath.slang:5-16).
    Returns (tangent, bitangent), each shaped like `normal`.
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    # Guard: when nz ~ -1 the main formula divides by ~0.
    degenerate = nz < -0.99998796
    safe_nz = jnp.where(degenerate, 0.0, nz)
    a = 1.0 / (1.0 + safe_nz)
    b = -nx * ny * a
    tangent = jnp.stack([1.0 - nx * nx * a, b, -nx], axis=-1)
    bitangent = jnp.stack([b, 1.0 - ny * ny * a, -ny], axis=-1)
    t_deg = jnp.broadcast_to(
        jnp.array([0.0, -1.0, 0.0], jnp.float32), tangent.shape
    )
    b_deg = jnp.broadcast_to(
        jnp.array([-1.0, 0.0, 0.0], jnp.float32), bitangent.shape
    )
    deg = degenerate[..., None]
    return jnp.where(deg, t_deg, tangent), jnp.where(deg, b_deg, bitangent)


def to_local(vec: jnp.ndarray, normal: jnp.ndarray,
             frame=None) -> jnp.ndarray:
    """World -> tangent frame where +z == normal (ref: shadermath.slang:18-23).

    `frame`: optional precomputed (tangent, bitangent) — the basis is
    a pure function of the normal, so callers evaluating several
    vectors in the same frame should build it once."""
    tangent, bitangent = frame if frame is not None \
        else orthonormal_basis(normal)
    return jnp.stack(
        [dot(vec, tangent), dot(vec, bitangent), dot(vec, normal)], axis=-1
    )


def to_world(vec: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Tangent -> world frame (ref: shadermath.slang:25-30)."""
    tangent, bitangent = orthonormal_basis(normal)
    return (
        vec[..., 0:1] * tangent
        + vec[..., 1:2] * bitangent
        + vec[..., 2:3] * normal
    )


def transform_point(mat3x4: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply a row-major 3x4 affine transform to points.

    mat3x4: (..., 3, 4); p: (..., 3).  Equivalent of the reference's
    VkTransformMatrixKHR layout (ref: MeshInstance.h:82-85).
    """
    return (
        jnp.einsum("...ij,...j->...i", mat3x4[..., :, :3], p)
        + mat3x4[..., :, 3]
    )


def transform_dir(mat3x4: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Apply only the linear part of a 3x4 transform to directions."""
    return jnp.einsum("...ij,...j->...i", mat3x4[..., :, :3], d)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance (used by denoiser edge-stopping)."""
    w = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
    return jnp.sum(rgb * w, axis=-1)
