"""Disney material records as a flat SoA array.

Field order mirrors the reference struct byte-for-byte semantics
(ref: Graphics/RayTracing/Scene.h:50-64, shaders/material.slang:3-15),
extended with emissive (the reference's createMaterial accepts
emissiveColor/emissionStrength but silently drops them,
ref: Scene.cpp:80-86 — we keep them so path tracing can use emitters).

Layout (MAT_W f32 per material):
  0:3   color
  3     subsurface
  4     metallic
  5     roughness
  6     specular        (default 0.5, ref: Scene.h:56)
  7     specularTint
  8     anisotropic
  9     sheen
  10    sheenTint
  11    clearCoat
  12    clearCoatGloss
  13:16 emissiveColor   (extension)
  16    emissionStrength(extension)
  17    ior             (extension, for refraction; default 1.5)
  18    transmission    (extension, 0 = opaque)
  19    base-color texture id (extension; -1 = none — models/textures.py)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

MAT_W = 20

COLOR = slice(0, 3)
SUBSURFACE = 3
METALLIC = 4
ROUGHNESS = 5
SPECULAR = 6
SPECULAR_TINT = 7
ANISOTROPIC = 8
SHEEN = 9
SHEEN_TINT = 10
CLEARCOAT = 11
CLEARCOAT_GLOSS = 12
EMISSIVE = slice(13, 16)
EMISSION_STRENGTH = 16
IOR = 17
TRANSMISSION = 18
BASE_COLOR_TEX = 19

# ROUGHNESS_ZERO guard (ref: Scene.h:18) — we clamp at shade time instead.
ROUGHNESS_MIN = 1e-4


class MatP(NamedTuple):
    """Material fields as separate per-ray planes (see ops/v3.py for the
    TPU layout rationale): every field is an (N,)-shaped array (or
    broadcastable), colors are V3s.  Built once per bounce from the
    gathered attribute rows; all shading reads are then free slices."""

    color: "object"       # V3
    subsurface: np.ndarray
    metallic: np.ndarray
    roughness: np.ndarray
    specular: np.ndarray
    specular_tint: np.ndarray
    anisotropic: np.ndarray
    sheen_tint: np.ndarray
    clearcoat: np.ndarray
    clearcoat_gloss: np.ndarray
    emissive: "object"    # V3
    emission_strength: np.ndarray
    ior: np.ndarray
    transmission: np.ndarray

    @staticmethod
    def from_rows(rows) -> "MatP":
        """From gathered (..., MAT_W) rows (compat path: slices along
        the minor axis relayout on TPU — prefer from_rows_t)."""
        from ..ops.v3 import V3

        f = lambda i: rows[..., i]
        return MatP(
            color=V3(f(0), f(1), f(2)), subsurface=f(SUBSURFACE),
            metallic=f(METALLIC), roughness=f(ROUGHNESS),
            specular=f(SPECULAR), specular_tint=f(SPECULAR_TINT),
            anisotropic=f(ANISOTROPIC), sheen_tint=f(SHEEN_TINT),
            clearcoat=f(CLEARCOAT), clearcoat_gloss=f(CLEARCOAT_GLOSS),
            emissive=V3(f(13), f(14), f(15)),
            emission_strength=f(EMISSION_STRENGTH), ior=f(IOR),
            transmission=f(TRANSMISSION))

    @staticmethod
    def from_rows_t(rt, base: int = 0) -> "MatP":
        """From transposed rows (W, N) — every field is a free row
        slice with rays in lanes.  `base`: row offset of the material
        block inside a wider table (lbvh.ATTR_MAT for Accel.attr)."""
        from ..ops.v3 import V3

        f = lambda i: rt[base + i]
        return MatP(
            color=V3(f(0), f(1), f(2)), subsurface=f(SUBSURFACE),
            metallic=f(METALLIC), roughness=f(ROUGHNESS),
            specular=f(SPECULAR), specular_tint=f(SPECULAR_TINT),
            anisotropic=f(ANISOTROPIC), sheen_tint=f(SHEEN_TINT),
            clearcoat=f(CLEARCOAT), clearcoat_gloss=f(CLEARCOAT_GLOSS),
            emissive=V3(f(13), f(14), f(15)),
            emission_strength=f(EMISSION_STRENGTH), ior=f(IOR),
            transmission=f(TRANSMISSION))


def make_material(
    color=(1.0, 1.0, 1.0),
    metallic: float = 0.0,
    roughness: float = 1.0,
    emissive_color=(0.0, 0.0, 0.0),
    emission_strength: float = 0.0,
    *,
    subsurface: float = 0.0,
    specular: float = 0.5,
    specular_tint: float = 0.0,
    anisotropic: float = 0.0,
    sheen: float = 0.0,
    sheen_tint: float = 0.0,
    clearcoat: float = 0.0,
    clearcoat_gloss: float = 0.0,
    ior: float = 1.5,
    transmission: float = 0.0,
    texture: int = -1,
) -> np.ndarray:
    """One material record; positional args match Scene::createMaterial
    (ref: Scene.h:139, Scene.cpp:80-86)."""
    m = np.zeros(MAT_W, np.float32)
    m[COLOR] = color
    m[SUBSURFACE] = subsurface
    m[METALLIC] = metallic
    m[ROUGHNESS] = roughness
    m[SPECULAR] = specular
    m[SPECULAR_TINT] = specular_tint
    m[ANISOTROPIC] = anisotropic
    m[SHEEN] = sheen
    m[SHEEN_TINT] = sheen_tint
    m[CLEARCOAT] = clearcoat
    m[CLEARCOAT_GLOSS] = clearcoat_gloss
    m[EMISSIVE] = emissive_color
    m[EMISSION_STRENGTH] = emission_strength
    m[IOR] = ior
    m[TRANSMISSION] = transmission
    m[BASE_COLOR_TEX] = float(texture)
    return m
