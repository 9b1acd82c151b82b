"""Morton (Z-order) codes for LBVH construction.

The reference delegates BVH build to the Vulkan driver
(vkCmdBuildAccelerationStructuresKHR, ref: Scene.cpp:256-311) and stubs
its own LBVH ("LBVH not implemented!", ref: Scene.cpp:135-138).  This
is the real thing: 30-bit Morton codes from quantized centroids, fully
vectorized uint32 bit math on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

_U = jnp.uint32


def expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (the classic magic-number interleave)."""
    v = v.astype(_U) & _U(0x3FF)
    v = (v * _U(0x00010001)) & _U(0xFF0000FF)
    v = (v * _U(0x00000101)) & _U(0x0F00F00F)
    v = (v * _U(0x00000011)) & _U(0xC30C30C3)
    v = (v * _U(0x00000005)) & _U(0x49249249)
    return v


def morton3d(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Interleave three 10-bit integers into a 30-bit Morton code."""
    return (expand_bits_10(x) << _U(2)) | (expand_bits_10(y) << _U(1)) \
        | expand_bits_10(z)


def quantize_centroids(centroids: jnp.ndarray, bounds_min: jnp.ndarray,
                       bounds_max: jnp.ndarray) -> jnp.ndarray:
    """Quantize points (N, 3) into the 10-bit lattice of [bmin, bmax]."""
    extent = jnp.maximum(bounds_max - bounds_min, 1e-9)
    q = (centroids - bounds_min) / extent
    q = jnp.clip(q * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return q


def morton_codes(centroids: jnp.ndarray, bounds_min: jnp.ndarray,
                 bounds_max: jnp.ndarray) -> jnp.ndarray:
    q = quantize_centroids(centroids, bounds_min, bounds_max)
    return morton3d(q[:, 0], q[:, 1], q[:, 2])
