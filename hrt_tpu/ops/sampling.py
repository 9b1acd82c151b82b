"""Importance samplers for bounce directions.

Port of the reference's sampler library (ref: shaders/sampler.slang):
cosine-weighted hemisphere (:53-65) and the Dupuy-Benyoub spherical-cap
GGX-VNDF sampler with anisotropic roughness (:67-93) plus its PDF
(:23-33).  The reference ships these but disables their use
(raytracing.slang:166-168 commented out, weight forced to 0); here they
drive real multi-bounce GI.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import materials as M
from ..models.materials import MatP
from . import v3
from .math3d import cross, dot, normalize, square, to_local, to_world
from .v3 import V3

TWO_PI = np.float32(6.2831853071795)
ONE_OVER_PI = np.float32(0.3183098861837)


# ---------------------------------------------------------------------------
# Planar cores (hot path; see ops/v3.py for the layout rationale).
# ---------------------------------------------------------------------------

def cosine_hemisphere_p(u0, u1):
    """Planar cosine_hemisphere: local-frame V3 + pdf."""
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt(u0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    d = V3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    return d, cos_theta * ONE_OVER_PI


def _aniso_p(mat: MatP):
    """ref: sampler.slang:35-42 (planar)."""
    aspect = jnp.sqrt(1.0 - mat.anisotropic * 0.9)
    r2 = square(jnp.maximum(mat.roughness, M.ROUGHNESS_MIN))
    ax = jnp.maximum(1e-3, r2 / aspect)
    ay = jnp.maximum(1e-3, r2 * aspect)
    return ax, ay


def _vndf_ratio_p(mat: MatP, wo: V3, wi: V3):
    """G2/G1 estimator weight (ref: sampler.slang:23-33, planar)."""
    a2 = square(square(jnp.maximum(mat.roughness, M.ROUGHNESS_MIN)))
    ndotl = wi.z
    ndotv = wo.z
    f1 = jnp.sqrt(a2 + (1.0 - a2) * ndotl * ndotl)
    f2 = jnp.sqrt(a2 + (1.0 - a2) * ndotv * ndotv)
    g1 = 2.0 * ndotv / jnp.maximum(f2 + ndotv, 1e-8)
    g2 = 2.0 * ndotl * ndotv / jnp.maximum(f1 * ndotv + f2 * ndotl, 1e-8)
    return g2 / jnp.maximum(g1, 1e-8)


def ggx_vndf_spherical_cap_p(mat: MatP, v_world: V3, n_world: V3,
                             u0, u1, frame=None):
    """Planar GGX-VNDF spherical-cap sampler (ref: sampler.slang:67-93).

    Same math as ggx_vndf_spherical_cap; `frame` optionally reuses a
    precomputed v3.orthonormal_basis(n_world).
    Returns (direction_world V3, weight)."""
    if frame is None:
        frame = v3.orthonormal_basis(n_world)
    wo = v3.to_local(v_world, n_world, frame)
    ax, ay = _aniso_p(mat)

    v = v3.normalize(V3(ax * wo.x, ay * wo.y, wo.z))
    lensq = v.x * v.x + v.y * v.y
    ok = lensq > 1e-12
    rsqrt = jnp.where(ok, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12)), 0.0)
    zero = jnp.zeros_like(rsqrt)
    t1 = V3(jnp.where(ok, -v.y * rsqrt, 1.0),
            jnp.where(ok, v.x * rsqrt, 0.0), zero)
    t2 = v3.cross(v, t1)

    r = jnp.sqrt(u0)
    phi = TWO_PI * u1
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2

    nh = (t1 * p1 + t2 * p2
          + v * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2)))
    wm = v3.normalize(V3(ax * nh.x, ay * nh.y, jnp.maximum(0.0, nh.z)))

    # Reflect wo about wm: wi = 2(wo.wm)wm - wo.
    wi = wm * (2.0 * v3.dot(wo, wm)) - wo
    weight = jnp.where(wi.z > 0.0, _vndf_ratio_p(mat, wo, wi), 0.0)
    return v3.to_world(wi, n_world, frame), weight


def cosine_hemisphere(u0, u1):
    """Sample local-frame direction + pdf (ref: sampler.slang:53-65).

    NOTE the reference's pdf quirk: it returns 1/(cosTheta/pi) — the
    *reciprocal* of the usual cos/pi pdf.  We return the standard
    pdf = cosTheta/pi; callers divide (so math is equivalent)."""
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt(u0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    d = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )
    pdf = cos_theta * ONE_OVER_PI
    return d, pdf


def anisotropic_from_material(mat):
    """ref: sampler.slang:35-42."""
    aspect = jnp.sqrt(1.0 - mat[..., M.ANISOTROPIC] * 0.9)
    r2 = square(jnp.maximum(mat[..., M.ROUGHNESS], M.ROUGHNESS_MIN))
    ax = jnp.maximum(1e-3, r2 / aspect)
    ay = jnp.maximum(1e-3, r2 * aspect)
    return ax, ay


def ggx_vndf_pdf_ratio(mat, wo, wi):
    """G2/G1 estimator weight (ref: sampler.slang:23-33).

    For VNDF sampling of the reflection lobe, the unbiased BRDF weight
    is F * G2/G1; the reference's GGXVNDFPDF returns that ratio."""
    a2 = square(square(jnp.maximum(mat[..., M.ROUGHNESS], M.ROUGHNESS_MIN)))
    ndotl = wi[..., 2]
    ndotv = wo[..., 2]
    f1 = jnp.sqrt(a2 + (1.0 - a2) * ndotl * ndotl)
    f2 = jnp.sqrt(a2 + (1.0 - a2) * ndotv * ndotv)
    g1 = 2.0 * ndotv / jnp.maximum(f2 + ndotv, 1e-8)
    g2 = 2.0 * ndotl * ndotv / jnp.maximum(f1 * ndotv + f2 * ndotl, 1e-8)
    return g2 / jnp.maximum(g1, 1e-8)


def ggx_vndf_spherical_cap(mat, v_world, n_world, u0, u1):
    """Sample a GGX-VNDF reflection direction (ref: sampler.slang:67-93).

    v_world points toward the viewer (away from surface).  Returns
    (direction_world, weight) where weight = G2/G1 (the BRDF/pdf ratio
    for the sampled lobe, Fresnel applied by the caller).
    Zero weight where the sampled direction goes below the surface.
    """
    wo = to_local(v_world, n_world)
    ax, ay = anisotropic_from_material(mat)

    # NOTE: the reference negates wo here (sampler.slang:71), i.e. it
    # feeds the *incoming ray* direction; combined with Slang reflect()
    # this produces the mirrored lobe.  We sample around +wo (standard
    # Dupuy-Benyoub) and reflect explicitly, which is the intended math.
    v = normalize(jnp.stack(
        [ax * wo[..., 0], ay * wo[..., 1], wo[..., 2]], axis=-1))

    lensq = square(v[..., 0]) + square(v[..., 1])
    rsqrt = jnp.where(lensq > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12)), 0.0)
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1] * rsqrt, v[..., 0] * rsqrt,
                   jnp.zeros_like(rsqrt)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), v.shape),
    )
    t2 = cross(v, t1)

    r = jnp.sqrt(u0)
    phi = TWO_PI * u1
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - square(p1))) + s * p2

    nh = (
        t1 * p1[..., None]
        + t2 * p2[..., None]
        + v * jnp.sqrt(jnp.maximum(0.0, 1.0 - square(p1) - square(p2)))[..., None]
    )
    wm = normalize(jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1],
         jnp.maximum(0.0, nh[..., 2])], axis=-1))

    # Reflect wo about wm: wi = 2(wo.wm)wm - wo.
    wi = 2.0 * dot(wo, wm)[..., None] * wm - wo
    weight = jnp.where(wi[..., 2] > 0.0, ggx_vndf_pdf_ratio(mat, wo, wi), 0.0)
    return to_world(wi, n_world), weight
