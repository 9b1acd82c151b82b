"""Planar 3-vectors: structure-of-planes math for the shading hot path.

TPU layout rationale (measured, round 2): arrays shaped (N, 3) put the
3-component axis in the 128-lane minor dimension, so every
vector->scalar op (dot, length, luminance) and every scalar->vector
broadcast compiles to cross-lane data movement; per-op xprof showed
those relayout fusions costing ~25% of device frame time.  A V3 holds
x/y/z as separate (N,) arrays in plain linear layout: every operation
is pure elementwise VPU work at full lane utilization, and components
flow into the Pallas packet kernel's (rows, 128) tiles as free
reshapes — no transposes anywhere in the frame.

This is the shading-side analogue of the SoA ray batches the kernels
already use (DESIGN.md); shaders/shadermath.slang:3-30 is the reference
counterpart of the helper set.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8


class V3(NamedTuple):
    """Three same-shaped float32 planes. Supports +, -, *, /, unary -.

    `v * s` with a scalar/array `s` scales; `a * b` with V3 operands is
    the Hadamard product (colors are V3s too)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic ------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- conversions -----------------------------------------------------
    @staticmethod
    def from_array(a: jnp.ndarray) -> "V3":
        """(..., 3) -> V3 of (...,) planes (a relayout on TPU — use only
        at module boundaries, not per-op)."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def const(c, like: jnp.ndarray | None = None) -> "V3":
        """V3 from a length-3 Python/numpy constant; broadcast against
        `like`'s shape lazily by XLA (planes stay 0-d if like is None)."""
        cx, cy, cz = (jnp.float32(c[0]), jnp.float32(c[1]),
                      jnp.float32(c[2]))
        if like is not None:
            ones = jnp.ones_like(like)
            return V3(cx * ones, cy * ones, cz * ones)
        return V3(cx, cy, cz)

    def to_array(self) -> jnp.ndarray:
        """V3 -> (..., 3) (relayout; boundary use only)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # -- shape helpers ---------------------------------------------------
    def reshape(self, *shape) -> "V3":
        return V3(self.x.reshape(*shape), self.y.reshape(*shape),
                  self.z.reshape(*shape))

    def map(self, f) -> "V3":
        return V3(f(self.x), f(self.y), f(self.z))

    @property
    def shape(self):
        return jnp.shape(self.x)


class PlaneView:
    """W (N,) field planes from one materialized (W, N//128, 128)
    relayout of gathered (N, W) rows.

    Materializing the plain 2-D transpose (W, N) still interleaves 8
    FIELDS per (8, 128) memory tile, so every field slice pays its own
    ~1.4 ms strided kLoop relayout at 1080p (24 of them: ~34 ms/frame,
    the slice_reduce_fusion wall in the round-4 profile).  With N split
    to (N//128, 128) minor dims, the (8, 128) tiling lives entirely
    inside ONE field's plane and a field slice is contiguous memory —
    XLA lowers `view[i]` + the flattening reshape as bitcast/views that
    fuse into consumers ((N,) T(1024) and (N//128, 128) T(8,128) are
    the same byte layout)."""

    __slots__ = ("rt3",)

    def __init__(self, rt3):
        self.rt3 = rt3

    def __getitem__(self, i):
        return self.rt3[i].reshape(-1)


def rows_to_planes(rows):
    """Transpose gathered (N, W) attribute rows into an indexable of W
    (N,) planes behind ONE materialized relayout copy (see PlaneView).
    Falls back to the 2-D transposed array when N % 128 != 0 (row
    slices of it are still correct, just slower)."""
    n, w = rows.shape
    if n % 128:
        return jax.lax.optimization_barrier(rows.T)
    return PlaneView(jax.lax.optimization_barrier(
        rows.T.reshape(w, n // 128, 128)))


def dot(a: V3, b: V3) -> jnp.ndarray:
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def length(a: V3) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: V3, eps: float = EPS) -> V3:
    inv = jnp.reciprocal(jnp.sqrt(jnp.maximum(dot(a, a), eps)))
    return a * inv


def where(mask: jnp.ndarray, a: V3, b: V3) -> V3:
    """Componentwise select; mask is a plane (no trailing vector axis)."""
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.where(mask, a.x, bx), jnp.where(mask, a.y, by),
              jnp.where(mask, a.z, bz))


def reflect(v: V3, n: V3) -> V3:
    """HLSL/Slang reflect: v - 2*dot(v,n)*n (v toward the surface)."""
    return v - n * (2.0 * dot(v, n))


def luminance(rgb: V3) -> jnp.ndarray:
    """Rec.709 luminance."""
    return (jnp.float32(0.2126) * rgb.x + jnp.float32(0.7152) * rgb.y
            + jnp.float32(0.0722) * rgb.z)


def max_component(a: V3) -> jnp.ndarray:
    return jnp.maximum(a.x, jnp.maximum(a.y, a.z))


def orthonormal_basis(n: V3):
    """Branch-free Frisvad basis (ref: shaders/shadermath.slang:5-16),
    planar form of math3d.orthonormal_basis (same arithmetic, same
    z < -1 guard).  Returns (tangent, bitangent)."""
    degenerate = n.z < -0.99998796
    safe_nz = jnp.where(degenerate, 0.0, n.z)
    a = 1.0 / (1.0 + safe_nz)
    b = -n.x * n.y * a
    tangent = V3(1.0 - n.x * n.x * a, b, -n.x)
    bitangent = V3(b, 1.0 - n.y * n.y * a, -n.y)
    t = where(degenerate, V3.const((0.0, -1.0, 0.0), like=n.x), tangent)
    bt = where(degenerate, V3.const((-1.0, 0.0, 0.0), like=n.x),
               bitangent)
    return t, bt


def to_local(vec: V3, normal: V3, frame=None) -> V3:
    """World -> tangent frame, +z == normal (ref: shadermath.slang:18-23)."""
    tangent, bitangent = frame if frame is not None \
        else orthonormal_basis(normal)
    return V3(dot(vec, tangent), dot(vec, bitangent), dot(vec, normal))


def to_world(vec: V3, normal: V3, frame=None) -> V3:
    """Tangent -> world frame (ref: shadermath.slang:25-30)."""
    tangent, bitangent = frame if frame is not None \
        else orthonormal_basis(normal)
    return tangent * vec.x + bitangent * vec.y + normal * vec.z
