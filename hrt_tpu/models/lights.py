"""Light records as a flat SoA array.

Mirrors the reference Light struct (ref: Graphics/RayTracing/Scene.h:72-78,
shaders/light.slang:10-16): pos[3], color[3], intensity, type.

Layout (LIGHT_W f32 per light):
  0:3  position
  3:6  color
  6    intensity
  7    type (0=POINT, 1=SPOT, 2=DIRECTIONAL; stored as f32)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

LIGHT_W = 8
POSITION = slice(0, 3)
COLOR = slice(3, 6)
INTENSITY = 6
TYPE = 7

POINT = 0
SPOT = 1
DIRECTIONAL = 2

# Fallback direction for non-point lights (ref: shaders/light.slang:37).
_DEFAULT_DIR = (0.9, -0.1, 0.0)


def make_light(position, color, intensity: float,
               light_type: int = POINT) -> np.ndarray:
    rec = np.zeros(LIGHT_W, np.float32)
    rec[POSITION] = position
    rec[COLOR] = color
    rec[INTENSITY] = intensity
    rec[TYPE] = light_type
    return rec


def process_light(lights: jnp.ndarray, world_pos: jnp.ndarray):
    """Vectorized processLight (ref: shaders/light.slang:23-39).

    lights: (L, LIGHT_W); world_pos: (..., 3).
    Returns (direction (..., L, 3) unnormalized, color (L, 3),
    effective intensity (..., L)).  Point lights get direction
    pos - worldPos and inverse-square falloff; others get the fixed
    reference direction.
    """
    lpos = lights[:, POSITION]                     # (L, 3)
    lcol = lights[:, COLOR]                        # (L, 3)
    lint = lights[:, INTENSITY]                    # (L,)
    ltype = lights[:, TYPE]                        # (L,)

    to_light = lpos - world_pos[..., None, :]      # (..., L, 3)
    d2 = jnp.sum(to_light * to_light, axis=-1)     # (..., L)
    is_point = ltype == POINT
    intensity = jnp.where(
        is_point, lint / jnp.maximum(d2, 1e-12), lint
    )
    fixed = jnp.asarray(_DEFAULT_DIR, jnp.float32)
    direction = jnp.where(is_point[:, None], to_light,
                          jnp.broadcast_to(fixed, to_light.shape))
    return direction, lcol, intensity
