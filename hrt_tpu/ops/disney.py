"""Disney BRDF, vectorized over shading batches.

Port of the reference's full Disney evaluation
(ref: shaders/disney.slang:11-116), preserving its quirks for pixel
parity:
- GTR1 uses log2, not ln (disney.slang:15-19);
- sheen omits the material.sheen scale factor (disney.slang:44-47,
  applied at :111 without multiplying by mat.sheen);
- evalSpecular's Fresnel uses schlickWeight(L.H) lerping color->white
  (disney.slang:80-93);
- the combined term is
  (diffuse/pi * color + sheen) * (1-metallic) + specular + clearcoat
  (disney.slang:95-116).

Materials arrive as gathered rows of the material table (see
models/materials.py for field offsets); all other args are (..., 3).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models import materials as M
from .math3d import dot, normalize, square, to_local

PI = jnp.float32(3.1415926535897)
ONE_OVER_PI = jnp.float32(0.3183098861837)


def schlick_fresnel(f0, vdoth):
    return f0 + (1.0 - f0) * jnp.power(1.0 - vdoth, 5.0)


def schlick_weight(f):
    m = jnp.clip(1.0 - f, 0.0, 1.0)
    return m * m * m * m * m


def gtr1(ndoth, a):
    """ref: disney.slang:15-19 (log2 quirk kept)."""
    a2 = a * a
    val = (a2 - 1.0) / (
        PI * jnp.log2(jnp.maximum(a2, 1e-8))
        * (1.0 + (a2 - 1.0) * ndoth * ndoth)
    )
    return jnp.where(a >= 1.0, ONE_OVER_PI, val)


def gtr2(ndoth, a):
    """Normalized isotropic GTR2/GGX.

    NOTE: the reference's GTR2 (disney.slang:21-24) is missing the
    square on the denominator — but it is dead code there (evalSpecular
    uses GTR2_anisotropic, which has the square); we implement the
    correct normalized form."""
    a2 = a * a
    return a2 / (PI * square(1.0 + (a2 - 1.0) * ndoth * ndoth))


def gtr2_anisotropic(ndoth, hdotx, hdoty, ax, ay):
    return 1.0 / (
        PI * ax * ay
        * square(square(hdotx / ax) + square(hdoty / ay) + ndoth * ndoth)
    )


def smith_ggx(ndotv, a):
    a2 = a * a
    return 2.0 / (1.0 + jnp.sqrt(a2 + (1.0 - a2) * ndotv * ndotv))


def smith_ggx_anisotropic(ndotv, vdotx, vdoty, ax, ay):
    return 1.0 / (
        ndotv
        + jnp.sqrt(square(vdotx * ax) + square(vdoty * ay) * ndotv * ndotv)
    )


def calculate_tint(color):
    """ref: disney.slang:39-42."""
    lum = dot(jnp.asarray([0.3, 0.6, 1.0], jnp.float32), color)[..., None]
    return jnp.where(lum > 0.0, color / jnp.maximum(lum, 1e-12),
                     jnp.ones_like(color))


def anisotropic_params(anisotropic, roughness):
    """ref: disney.slang:72-78 (note: built from (anisotropic, roughness)
    packed as p=(x=aniso, y=rough), aspect from p.x, r2 = p.y^2)."""
    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    r2 = roughness * roughness
    ax = jnp.maximum(1e-3, r2 / aspect)
    ay = jnp.maximum(1e-3, r2 * aspect)
    return ax, ay


def eval_sheen(mat, hdotl):
    tint = calculate_tint(mat[..., M.COLOR])
    sheen_tint = mat[..., M.SHEEN_TINT, None]
    return (1.0 + (tint - 1.0) * sheen_tint) * schlick_weight(hdotl)[..., None]


def eval_clearcoat(mat, ndoth, ndotl, ndotv, ldoth):
    gloss = mat[..., M.CLEARCOAT_GLOSS]
    d = gtr1(ndoth, 0.1 + (0.001 - 0.1) * gloss)
    f = schlick_fresnel(0.04, ldoth)
    g = smith_ggx(ndotl, 0.25) * smith_ggx(ndotv, 0.25)
    return 0.25 * mat[..., M.CLEARCOAT] * d * f * g


def eval_diffuse(mat, local_l, local_v, local_h):
    """ref: disney.slang:57-69 (operates on tangent-frame vectors)."""
    rough = mat[..., M.ROUGHNESS]
    fl = schlick_weight(local_l[..., 2])
    fv = schlick_weight(local_v[..., 2])
    hdotl = dot(local_h, local_l)
    fd90 = 0.5 + 2.0 * rough * square(hdotl)
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)
    fss90 = square(hdotl) * rough
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    lz_vz = local_l[..., 2] + local_v[..., 2]
    ss = 1.25 * (fss * (1.0 / jnp.maximum(lz_vz, 1e-6) - 0.5) + 0.5)
    return fd + (ss - fd) * mat[..., M.SUBSURFACE]


def eval_specular(mat, local_h, local_v, local_l):
    """ref: disney.slang:80-93."""
    ax, ay = anisotropic_params(mat[..., M.ANISOTROPIC],
                                mat[..., M.ROUGHNESS])
    tint = calculate_tint(mat[..., M.COLOR])
    spec = mat[..., M.SPECULAR, None]
    spec_tint = mat[..., M.SPECULAR_TINT, None]
    metallic = mat[..., M.METALLIC, None]
    base = spec * 0.08 * (1.0 + (tint - 1.0) * spec_tint)
    color = base + (mat[..., M.COLOR] - base) * metallic
    ndoth = local_h[..., 2]
    d = gtr2_anisotropic(ndoth, local_h[..., 0], local_h[..., 1], ax, ay)
    fresnel = schlick_weight(dot(local_l, local_h))[..., None]
    f = color + (1.0 - color) * fresnel
    g = (
        smith_ggx_anisotropic(local_l[..., 2], local_l[..., 0],
                              local_l[..., 1], ax, ay)
        * smith_ggx_anisotropic(local_v[..., 2], local_v[..., 0],
                                local_v[..., 1], ax, ay)
    )
    return (d * g)[..., None] * f


def brdf(mat, n, v, l, frame=None):
    """Full Disney BRDF (ref: disney.slang:95-116).

    mat: (..., MAT_W) gathered material rows; n/v/l: (..., 3) with v
    pointing away from the surface toward the viewer.  Returns (..., 3);
    zero where NdotL or NdotV <= 0 (reference's early-out).
    `frame`: optional precomputed orthonormal_basis(n) — hoisting it
    saves rebuilding the identical basis for H, V and L (and across
    lights in NEE); results are bitwise identical.
    """
    ndotl = dot(n, l)
    ndotv = dot(n, v)
    h = normalize(v + l)
    ndoth = dot(n, h)
    hdotl = dot(h, l)

    if frame is None:
        from .math3d import orthonormal_basis

        frame = orthonormal_basis(n)
    local_h = to_local(h, n, frame)
    local_v = to_local(v, n, frame)
    local_l = to_local(l, n, frame)

    sheen = eval_sheen(mat, hdotl)
    clearcoat = eval_clearcoat(mat, ndoth, ndotl, ndotv, hdotl)[..., None]
    specular = eval_specular(mat, local_h, local_v, local_l)
    diffuse = eval_diffuse(mat, local_l, local_v, local_h)[..., None]

    metallic = mat[..., M.METALLIC, None]
    color = mat[..., M.COLOR]
    out = (
        (ONE_OVER_PI * diffuse * color + sheen) * (1.0 - metallic)
        + specular
        + clearcoat
    )
    visible = ((ndotl > 0.0) & (ndotv > 0.0))[..., None]
    return jnp.where(visible, out, 0.0)
