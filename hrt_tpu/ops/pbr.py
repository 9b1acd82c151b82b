"""Alternative glTF metallic-roughness BSDF.

Port of the reference's unused second material model
(ref: shaders/pbr.slang:9-153 — a combined glossy lobe with GGX + Smith
over a Lambertian base, not included by raytracing.slang).  Selectable
per render via RenderConfig-independent call or future per-material
flag; mainly used for cross-validating the Disney implementation.

NOTE: pbr.slang:36-47 contains a buggy duplicate of the orthonormal
basis (`1.0 - nx*ny*a` instead of `1.0 - nx*nx*a` at :45); we use the
correct shared basis from ops/math3d (SURVEY.md S6).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import materials as M
from .math3d import dot, normalize

# np (not jnp) scalar: keeps this module import-safe before
# jax.distributed.initialize (farm workers import the model stack
# lazily; a module-level device constant would pin the backend).
PI = np.float32(3.1415926535897)


def fresnel_schlick(f0, vdoth):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - vdoth, 0.0, 1.0),
                                       5.0)[..., None]


def distribution_ggx(ndoth, alpha):
    a2 = alpha * alpha
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * denom * denom, 1e-8)


def geometry_smith(ndotv, ndotl, alpha):
    k = alpha * alpha / 2.0
    gv = ndotv / jnp.maximum(ndotv * (1.0 - k) + k, 1e-8)
    gl = ndotl / jnp.maximum(ndotl * (1.0 - k) + k, 1e-8)
    return gv * gl


def bsdf_evaluate_simple(mat, n, v, l):
    """Combined diffuse + glossy lobe (ref: pbr.slang:95-136).

    mat: gathered material rows (..., MAT_W); n/v/l unit vectors with
    v toward the viewer.  Returns (..., 3) BSDF value (no cosine).
    """
    ndotl = dot(n, l)
    ndotv = dot(n, v)
    h = normalize(v + l)
    ndoth = jnp.maximum(dot(n, h), 0.0)
    vdoth = jnp.maximum(dot(v, h), 0.0)

    base = mat[..., M.COLOR]
    metallic = mat[..., M.METALLIC, None]
    rough = jnp.clip(mat[..., M.ROUGHNESS], 0.04, 1.0)

    f0 = 0.04 + (base - 0.04) * metallic
    f = fresnel_schlick(f0, vdoth)
    d = distribution_ggx(ndoth, rough)[..., None]
    g = geometry_smith(jnp.maximum(ndotv, 1e-4),
                       jnp.maximum(ndotl, 1e-4), rough)[..., None]
    specular = f * d * g / jnp.maximum(
        4.0 * ndotv * ndotl, 1e-6)[..., None]
    diffuse = (1.0 - f) * (1.0 - metallic) * base / PI
    out = diffuse + specular
    visible = ((ndotl > 0.0) & (ndotv > 0.0))[..., None]
    return jnp.where(visible, out, 0.0)
