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

The core (`brdf_p`) is PLANAR: materials arrive as MatP field planes
and vectors as V3s (see ops/v3.py for the layout rationale — this
keeps the whole evaluation elementwise on linear arrays, no cross-lane
relayouts).  The array-API `brdf` wraps it for (..., MAT_W)/(..., 3)
callers (tests, compat paths).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.materials import MatP
from . import v3
from .v3 import V3

# numpy scalars (not jnp arrays): jnp constants at module level become
# captured tracer constants inside Pallas kernels (shade_pallas.py);
# np.float32 folds to the same f32 literal in both paths.
PI = np.float32(3.1415926535897)
ONE_OVER_PI = np.float32(0.3183098861837)


def schlick_fresnel(f0, vdoth):
    # Explicit multiply chain instead of jnp.power: same math (modulo
    # ulps; golden tests are PSNR-gated), and it lowers in Mosaic so
    # the predicated shading kernel (ops/shade_pallas.py) can share
    # this exact definition with the XLA path.
    m = 1.0 - vdoth
    return f0 + (1.0 - f0) * (m * m * m * m * m)


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
    d = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (PI * d * d)


def gtr2_anisotropic(ndoth, hdotx, hdoty, ax, ay):
    s = (hdotx / ax) ** 2 + (hdoty / ay) ** 2 + ndoth * ndoth
    return 1.0 / (PI * ax * ay * s * s)


def smith_ggx(ndotv, a):
    a2 = a * a
    return 2.0 / (1.0 + jnp.sqrt(a2 + (1.0 - a2) * ndotv * ndotv))


def smith_ggx_anisotropic(ndotv, vdotx, vdoty, ax, ay):
    return 1.0 / (
        ndotv
        + jnp.sqrt((vdotx * ax) ** 2 + (vdoty * ay) ** 2 * ndotv * ndotv)
    )


def calculate_tint(color: V3) -> V3:
    """ref: disney.slang:39-42."""
    lum = 0.3 * color.x + 0.6 * color.y + 1.0 * color.z
    ok = lum > 0.0
    inv = 1.0 / jnp.maximum(lum, 1e-12)
    return v3.where(ok, color * inv, V3.const((1.0, 1.0, 1.0),
                                              like=lum))


def anisotropic_params(anisotropic, roughness):
    """ref: disney.slang:72-78 (note: built from (anisotropic, roughness)
    packed as p=(x=aniso, y=rough), aspect from p.x, r2 = p.y^2)."""
    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    r2 = roughness * roughness
    ax = jnp.maximum(1e-3, r2 / aspect)
    ay = jnp.maximum(1e-3, r2 * aspect)
    return ax, ay


def eval_sheen(mat: MatP, hdotl) -> V3:
    tint = calculate_tint(mat.color)
    one = V3.const((1.0, 1.0, 1.0), like=hdotl)
    return (one + (tint - 1.0) * mat.sheen_tint) * schlick_weight(hdotl)


def eval_clearcoat(mat: MatP, ndoth, ndotl, ndotv, ldoth):
    d = gtr1(ndoth, 0.1 + (0.001 - 0.1) * mat.clearcoat_gloss)
    f = schlick_fresnel(0.04, ldoth)
    g = smith_ggx(ndotl, 0.25) * smith_ggx(ndotv, 0.25)
    return 0.25 * mat.clearcoat * d * f * g


def eval_diffuse(mat: MatP, local_l: V3, local_v: V3, local_h: V3):
    """ref: disney.slang:57-69 (operates on tangent-frame vectors)."""
    rough = mat.roughness
    fl = schlick_weight(local_l.z)
    fv = schlick_weight(local_v.z)
    hdotl = v3.dot(local_h, local_l)
    fd90 = 0.5 + 2.0 * rough * hdotl * hdotl
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)
    fss90 = hdotl * hdotl * rough
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    lz_vz = local_l.z + local_v.z
    ss = 1.25 * (fss * (1.0 / jnp.maximum(lz_vz, 1e-6) - 0.5) + 0.5)
    return fd + (ss - fd) * mat.subsurface


def eval_specular(mat: MatP, local_h: V3, local_v: V3, local_l: V3) -> V3:
    """ref: disney.slang:80-93."""
    ax, ay = anisotropic_params(mat.anisotropic, mat.roughness)
    tint = calculate_tint(mat.color)
    one = V3.const((1.0, 1.0, 1.0), like=local_h.z)
    base = (one + (tint - 1.0) * mat.specular_tint) * (mat.specular
                                                       * 0.08)
    color = base + (mat.color - base) * mat.metallic
    d = gtr2_anisotropic(local_h.z, local_h.x, local_h.y, ax, ay)
    fresnel = schlick_weight(v3.dot(local_l, local_h))
    f = color + (one - color) * fresnel
    g = (smith_ggx_anisotropic(local_l.z, local_l.x, local_l.y, ax, ay)
         * smith_ggx_anisotropic(local_v.z, local_v.x, local_v.y, ax,
                                 ay))
    return f * (d * g)


def brdf_p(mat: MatP, n: V3, v: V3, l: V3, frame=None) -> V3:
    """Full Disney BRDF, planar core (ref: disney.slang:95-116).

    v points away from the surface toward the viewer.  Returns a V3;
    zero where NdotL or NdotV <= 0 (reference's early-out).
    `frame`: optional precomputed v3.orthonormal_basis(n) — hoisting it
    saves rebuilding the identical basis across lights in NEE."""
    ndotl = v3.dot(n, l)
    ndotv = v3.dot(n, v)
    h = v3.normalize(v + l)
    ndoth = v3.dot(n, h)
    hdotl = v3.dot(h, l)

    if frame is None:
        frame = v3.orthonormal_basis(n)
    local_h = v3.to_local(h, n, frame)
    local_v = v3.to_local(v, n, frame)
    local_l = v3.to_local(l, n, frame)

    sheen = eval_sheen(mat, hdotl)
    clearcoat = eval_clearcoat(mat, ndoth, ndotl, ndotv, hdotl)
    specular = eval_specular(mat, local_h, local_v, local_l)
    diffuse = eval_diffuse(mat, local_l, local_v, local_h)

    out = ((mat.color * (ONE_OVER_PI * diffuse) + sheen)
           * (1.0 - mat.metallic) + specular + clearcoat)
    visible = (ndotl > 0.0) & (ndotv > 0.0)
    return v3.where(visible, out, V3.const((0.0, 0.0, 0.0), like=ndotl))


def brdf(mat, n, v, l, frame=None):
    """Array-API wrapper over brdf_p.

    mat: (..., MAT_W) gathered material rows; n/v/l: (..., 3).  Returns
    (..., 3).  Prefer brdf_p + MatP/V3 on hot paths (the conversions
    here are per-call relayouts)."""
    fr = None
    if frame is not None:
        fr = (V3.from_array(frame[0]), V3.from_array(frame[1]))
    out = brdf_p(MatP.from_rows(mat), V3.from_array(n),
                 V3.from_array(v), V3.from_array(l), frame=fr)
    x, y, z = jnp.broadcast_arrays(out.x, out.y, out.z)
    return jnp.stack([x, y, z], axis=-1)
