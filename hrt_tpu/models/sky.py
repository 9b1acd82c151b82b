"""Procedural sky.

The reference uploads a SkyInfo buffer (ref: Graphics/RayTracing/
Scene.cpp:333-355, Scene.h:90-104) that its miss shader never reads —
miss returns black (ref: shaders/raytracing.slang:172-176).  We
implement the sky the parameters describe: a sky/horizon/ground
gradient with a sun disc + glow; `enabled=False` reproduces the
reference's black-miss behavior for pixel parity.

Layout (SKY_W f32):
  0:3   skyColor       9:12  sunDirection     15  angularSize
  3:6   horizonColor   12:15 upDirection      16  glowIntensity
  6:9   groundColor    [scalars]              17  glowSharpness
  13(sc) brightness                            18  glowSize
                                               19  lightRadiance
Scalar block (indices 13.. follow the vectors): brightness=13? —
see OFFSETS below; kept symbolic to avoid off-by-ones.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.math3d import normalize, dot

SKY_W = 20
SKY_COLOR = slice(0, 3)
HORIZON_COLOR = slice(3, 6)
GROUND_COLOR = slice(6, 9)
SUN_DIRECTION = slice(9, 12)
UP_DIRECTION = slice(12, 15)
BRIGHTNESS = 15
HORIZON_SIZE = 16
ANGULAR_SIZE = 17
GLOW_INTENSITY = 18
GLOW_SHARPNESS = 19
# glowSize / lightRadiance folded into glow math; kept for completeness:
SKY_W_FULL = 22
GLOW_SIZE = 20
LIGHT_RADIANCE = 21


def default_sky() -> np.ndarray:
    """Defaults exactly as Scene::createSky (ref: Scene.cpp:334-348)."""
    s = np.zeros(SKY_W_FULL, np.float32)
    s[SKY_COLOR] = (0.17, 0.24, 0.31)
    s[HORIZON_COLOR] = (1.0, 0.5, 0.31)
    s[GROUND_COLOR] = (0.1, 0.06, 0.04)
    s[SUN_DIRECTION] = (0.9, -0.1, 0.0)
    s[UP_DIRECTION] = (0.0, -1.0, 0.0)  # y-down world
    s[BRIGHTNESS] = 0.8
    s[HORIZON_SIZE] = 0.5
    s[ANGULAR_SIZE] = 0.08
    s[GLOW_INTENSITY] = 2.5
    s[GLOW_SHARPNESS] = 0.2
    s[GLOW_SIZE] = 0.2
    s[LIGHT_RADIANCE] = 0.7
    return s


def eval_sky_p(sky: jnp.ndarray, d, enabled: bool = True):
    """Planar eval_sky: d is a V3 of unit directions; returns a V3.
    Same math as eval_sky (see ops/v3.py for the layout rationale)."""
    from ..ops import v3
    from ..ops.v3 import V3

    if not enabled:
        z = jnp.zeros_like(d.x)
        return V3(z, z, z)
    up = normalize(sky[UP_DIRECTION])
    sun = normalize(sky[SUN_DIRECTION])
    elev = d.x * up[0] + d.y * up[1] + d.z * up[2]
    horizon_size = jnp.maximum(sky[HORIZON_SIZE], 1e-3)
    t_sky = jnp.clip(elev / horizon_size, 0.0, 1.0)
    t_gnd = jnp.clip(-elev / horizon_size, 0.0, 1.0)
    hor = V3(sky[3], sky[4], sky[5])
    skc = V3(sky[0], sky[1], sky[2])
    gnd = V3(sky[6], sky[7], sky[8])
    base = hor * ((1.0 - t_sky) * (1.0 - t_gnd)) + skc * t_sky \
        + gnd * t_gnd
    cos_sun = d.x * sun[0] + d.y * sun[1] + d.z * sun[2]
    cos_disc = jnp.cos(sky[ANGULAR_SIZE])
    disc = (cos_sun >= cos_disc).astype(jnp.float32) * sky[LIGHT_RADIANCE]
    ang = jnp.arccos(jnp.clip(cos_sun, -1.0, 1.0))
    glow = sky[GLOW_INTENSITY] * jnp.exp(
        -(ang - sky[ANGULAR_SIZE])
        / jnp.maximum(sky[GLOW_SIZE], 1e-3)
        * jnp.maximum(sky[GLOW_SHARPNESS], 1e-3) * 10.0
    ) * (cos_sun > 0).astype(jnp.float32)
    above = (elev > -horizon_size).astype(jnp.float32)
    sun_term = (disc + glow) * above
    out = base * sky[BRIGHTNESS] + sun_term
    return out


def eval_sky(sky: jnp.ndarray, directions: jnp.ndarray,
             enabled: bool = True) -> jnp.ndarray:
    """Evaluate sky radiance for unit ray directions (..., 3).

    Gradient between ground/horizon/sky colors by elevation, plus a sun
    disc of `angularSize` radius with an exponential glow halo.  With
    enabled=False returns black (reference miss parity).
    """
    if not enabled:
        return jnp.zeros(directions.shape, jnp.float32)
    up = normalize(sky[UP_DIRECTION])
    sun = normalize(sky[SUN_DIRECTION])
    # Elevation in [-1, 1]: +1 at zenith ("up" = -y), -1 at nadir.
    elev = dot(directions, up)[..., None]
    horizon_size = jnp.maximum(sky[HORIZON_SIZE], 1e-3)
    t_sky = jnp.clip(elev / horizon_size, 0.0, 1.0)
    t_gnd = jnp.clip(-elev / horizon_size, 0.0, 1.0)
    base = (
        sky[HORIZON_COLOR]
        * (1.0 - t_sky) * (1.0 - t_gnd)
        + sky[SKY_COLOR] * t_sky
        + sky[GROUND_COLOR] * t_gnd
    )
    cos_sun = dot(directions, sun)[..., None]
    cos_disc = jnp.cos(sky[ANGULAR_SIZE])
    disc = (cos_sun >= cos_disc).astype(jnp.float32) * sky[LIGHT_RADIANCE]
    ang = jnp.arccos(jnp.clip(cos_sun, -1.0, 1.0))
    glow = sky[GLOW_INTENSITY] * jnp.exp(
        -(ang - sky[ANGULAR_SIZE])
        / jnp.maximum(sky[GLOW_SIZE], 1e-3)
        * jnp.maximum(sky[GLOW_SHARPNESS], 1e-3) * 10.0
    ) * (cos_sun > 0).astype(jnp.float32)
    above = (elev > -horizon_size).astype(jnp.float32)
    sun_col = jnp.ones(3, jnp.float32)
    return sky[BRIGHTNESS] * base + (disc + glow) * sun_col * above
