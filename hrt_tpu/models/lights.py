"""Light records as a flat SoA array.

Mirrors the reference Light struct (ref: Graphics/RayTracing/Scene.h:72-78,
shaders/light.slang:10-16): pos[3], color[3], intensity, type — extended
with a direction + cone so SPOT/DIRECTIONAL are real (the reference
declares the enum but gives every non-point light a fixed direction,
ref: shaders/light.slang:36-38; we keep that exact fallback when no
direction is authored, for parity).

Layout (LIGHT_W f32 per light):
  0:3  position       7     type (0=POINT, 1=SPOT, 2=DIRECTIONAL)
  3:6  color          8:11  direction (zero => reference fallback)
  6    intensity      11    cos(cone half-angle) for SPOT
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

LIGHT_W = 12
POSITION = slice(0, 3)
COLOR = slice(3, 6)
INTENSITY = 6
TYPE = 7
DIRECTION = slice(8, 11)
COS_CONE = 11

POINT = 0
SPOT = 1
DIRECTIONAL = 2

# Fallback direction for non-point lights (ref: shaders/light.slang:37).
_DEFAULT_DIR = (0.9, -0.1, 0.0)


def make_light(position, color, intensity: float,
               light_type: int = POINT, direction=(0.0, 0.0, 0.0),
               cone_angle: float = 0.0) -> np.ndarray:
    rec = np.zeros(LIGHT_W, np.float32)
    rec[POSITION] = position
    rec[COLOR] = color
    rec[INTENSITY] = intensity
    rec[TYPE] = light_type
    rec[DIRECTION] = direction
    rec[COS_CONE] = np.cos(cone_angle) if cone_angle else -1.0
    return rec


def process_light_one(light: jnp.ndarray, p):
    """Planar processLight for ONE light row (LIGHT_W,) against a V3 of
    world positions (see ops/v3.py).  Returns (to_light V3 unnormalized,
    color V3-of-scalars, intensity plane, unbounded 0-d bool).

    Same semantics as process_light; the renderer unrolls the
    (small, static) light loop so every term stays a linear plane."""
    from ..ops import v3
    from ..ops.v3 import V3

    lint = light[INTENSITY]
    ltype = light[TYPE]
    ldir = V3(light[8], light[9], light[10])
    has_dir = v3.dot(ldir, ldir) > 1e-12

    to_light_pt = V3(light[0] - p.x, light[1] - p.y, light[2] - p.z)
    d2 = v3.dot(to_light_pt, to_light_pt)
    falloff = lint / jnp.maximum(d2, 1e-12)

    is_point = ltype == POINT
    is_spot = ltype == SPOT
    is_dir = ltype == DIRECTIONAL

    axis = ldir * (1.0 / jnp.maximum(jnp.sqrt(v3.dot(ldir, ldir)),
                                     1e-12))
    cos_to = v3.dot(-to_light_pt, axis) / jnp.maximum(jnp.sqrt(d2),
                                                      1e-12)
    in_cone = cos_to >= light[COS_CONE]
    spot_int = falloff * in_cone.astype(jnp.float32)

    fixed = V3(*(jnp.float32(c) for c in _DEFAULT_DIR))
    dir_to_light = v3.where(has_dir, -ldir, fixed)

    intensity = jnp.where(is_point, falloff,
                          jnp.where(is_spot & has_dir, spot_int, lint))
    ones = jnp.ones_like(p.x)
    direction = v3.where(is_point | is_spot, to_light_pt,
                         dir_to_light * ones)
    unbounded = is_dir & has_dir
    color = V3(light[3], light[4], light[5])
    return direction, color, intensity, unbounded


def process_light(lights: jnp.ndarray, world_pos: jnp.ndarray):
    """Vectorized processLight (ref: shaders/light.slang:23-39).

    lights: (L, LIGHT_W); world_pos: (..., 3).
    Returns (to_light (..., L, 3) unnormalized, color (L, 3),
    effective intensity (..., L), unbounded_shadow (L,) bool).

    POINT: direction = pos - worldPos, inverse-square falloff.
    SPOT:  same + hard cone cut on the authored direction.
    DIRECTIONAL with an authored direction: to-light = -direction,
    no falloff, unbounded shadow ray (testShadow's `directional`
    TMax = INFINITE, ref: raytracing.slang:61).
    Non-point without a direction: the reference's fixed fallback.
    """
    lpos = lights[:, POSITION]                     # (L, 3)
    lcol = lights[:, COLOR]                        # (L, 3)
    lint = lights[:, INTENSITY]                    # (L,)
    ltype = lights[:, TYPE]                        # (L,)
    ldir = lights[:, DIRECTION]                    # (L, 3)
    has_dir = jnp.sum(ldir * ldir, -1) > 1e-12

    to_light_pt = lpos - world_pos[..., None, :]   # (..., L, 3)
    d2 = jnp.sum(to_light_pt * to_light_pt, axis=-1)
    falloff = lint / jnp.maximum(d2, 1e-12)

    is_point = ltype == POINT
    is_spot = ltype == SPOT
    is_dir = ltype == DIRECTIONAL

    # Spot cone factor on the authored axis.
    axis = ldir / jnp.maximum(
        jnp.sqrt(jnp.sum(ldir * ldir, -1, keepdims=True)), 1e-12)
    cos_to = jnp.sum(-to_light_pt * axis, -1) / jnp.maximum(
        jnp.sqrt(d2), 1e-12)
    in_cone = cos_to >= lights[:, COS_CONE]
    spot_int = falloff * in_cone.astype(jnp.float32)

    fixed = jnp.broadcast_to(jnp.asarray(_DEFAULT_DIR, jnp.float32),
                             to_light_pt.shape)
    dir_to_light = jnp.where(has_dir[:, None], -ldir, fixed)
    dir_to_light = jnp.broadcast_to(dir_to_light, to_light_pt.shape)

    intensity = jnp.where(is_point, falloff,
                          jnp.where(is_spot & has_dir, spot_int, lint))
    direction = jnp.where((is_point | is_spot)[:, None], to_light_pt,
                          dir_to_light)
    unbounded = is_dir & has_dir
    return direction, lcol, intensity, unbounded
