"""Predicated Disney evaluation: the Pallas shading kernel.

The XLA shading path evaluates the full Disney BRDF for EVERY
(ray, light) pair — sky pixels, back-facing lanes, and sub-threshold
lights included (elementwise programs can't branch).  This kernel is
the shader-scheduling analogue the reference gets from the GPU's SBT
dispatch (ref: Graphics/RayTracing/RTPipeline.cpp:185-224 — miss rays
simply never run the hit shader): rays are already traversal-block
ordered, so relevance is spatially coherent, and each (8, 128) ray
GROUP whose lanes are all irrelevant skips the whole evaluation behind
one scalar-bit branch (SURVEY.md H3's missing half; VERDICT round-2
item 4).

The math is literally ops/disney.brdf_p — the same functions traced
into the kernel on (8, 128) group slices — so the XLA path and the
kernel agree to reassociation ulps (golden tests are PSNR-gated).

Layout: one call evaluates ALL lights, light-major (the same (L*N,)
geometry as the shadow batch); the per-ray planes (material, normal,
view) are shared across lights via an index-map modulo, not tiled in
HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.materials import MatP
from . import disney
from .traversal_pallas import TILE_LANES, TILE_ROWS
from .v3 import V3

TILE = TILE_ROWS * TILE_LANES


def _make_kernel(ng: int):
    def kernel(gm_ref,
               cx_ref, cy_ref, cz_ref, ss_ref, me_ref, ro_ref, sp_ref,
               st_ref, an_ref, sh_ref, cc_ref, cg_ref,
               nx_ref, ny_ref, nz_ref, vx_ref, vy_ref, vz_ref,
               lx_ref, ly_ref, lz_ref,
               fx_ref, fy_ref, fz_ref):
        i = pl.program_id(0)
        fx_ref[:, :] = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
        fy_ref[:, :] = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
        fz_ref[:, :] = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
        for g in range(ng):
            sl = slice(8 * g, 8 * (g + 1))

            @pl.when(gm_ref[i * ng + g] != 0)
            def _(sl=sl):
                zero = jnp.zeros((8, TILE_LANES), jnp.float32)
                mat = MatP(
                    color=V3(cx_ref[sl, :], cy_ref[sl, :],
                             cz_ref[sl, :]),
                    subsurface=ss_ref[sl, :], metallic=me_ref[sl, :],
                    roughness=ro_ref[sl, :], specular=sp_ref[sl, :],
                    specular_tint=st_ref[sl, :],
                    anisotropic=an_ref[sl, :],
                    sheen_tint=sh_ref[sl, :], clearcoat=cc_ref[sl, :],
                    clearcoat_gloss=cg_ref[sl, :],
                    emissive=V3(zero, zero, zero),
                    emission_strength=zero, ior=zero,
                    transmission=zero)
                n = V3(nx_ref[sl, :], ny_ref[sl, :], nz_ref[sl, :])
                v = V3(vx_ref[sl, :], vy_ref[sl, :], vz_ref[sl, :])
                l = V3(lx_ref[sl, :], ly_ref[sl, :], lz_ref[sl, :])
                f = disney.brdf_p(mat, n, v, l)
                fx_ref[sl, :] = f.x
                fy_ref[sl, :] = f.y
                fz_ref[sl, :] = f.z

    return kernel


@functools.partial(jax.jit, static_argnames=("num_lights",))
def _brdf_light_major(gmask, shared, light, num_lights: int):
    """shared: 18 (Np//128, 128) per-ray planes; light: 3
    (L*Np//128, 128) light-direction planes; gmask (L*tpl, ng) i32."""
    rows_l = light[0].shape[0]
    tpl = shared[0].shape[0] // TILE_ROWS
    n_tiles = rows_l // TILE_ROWS
    ng = TILE_ROWS // 8

    # The group masks ride scalar prefetch (whole array in SMEM; the
    # kernel indexes it by program id) — small SMEM inputs can't
    # satisfy the (8, 128) block-tiling rule as per-tile blocks.
    shared_spec = pl.BlockSpec((TILE_ROWS, TILE_LANES),
                               lambda i, gm: (i % tpl, 0),
                               memory_space=pltpu.VMEM)
    light_spec = pl.BlockSpec((TILE_ROWS, TILE_LANES),
                              lambda i, gm: (i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(ng),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[shared_spec] * 18 + [light_spec] * 3,
            out_specs=[light_spec] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct((rows_l, TILE_LANES),
                                        jnp.float32)] * 3,
        interpret=(jax.default_backend() == "cpu"),
    )(gmask.reshape(-1), *shared, *light)
    return V3(*out)


def brdf_light_major(mat: MatP, n: V3, view: V3, l_lm: V3,
                     relevant_lm, num_lights: int) -> V3:
    """Disney BRDF over (L*N,) light-major direction planes with shared
    per-ray material/normal/view planes.  Groups with no relevant lane
    are skipped (their f is zero — callers mask by `relevant` anyway).
    Returns a V3 of (L*N,) planes."""
    n_rays = n.x.shape[0]
    n_pad = (n_rays + TILE - 1) // TILE * TILE

    def pad_r(x):
        return jnp.pad(x, (0, n_pad - n_rays)).reshape(-1, TILE_LANES)

    def pad_l(x):
        x = x.reshape(num_lights, n_rays)
        x = jnp.pad(x, ((0, 0), (0, n_pad - n_rays)))
        return x.reshape(-1, TILE_LANES)

    shared = [pad_r(p) for p in (
        mat.color.x, mat.color.y, mat.color.z, mat.subsurface,
        mat.metallic, mat.roughness, mat.specular, mat.specular_tint,
        mat.anisotropic, mat.sheen_tint, mat.clearcoat,
        mat.clearcoat_gloss, n.x, n.y, n.z, view.x, view.y, view.z)]
    light = [pad_l(p) for p in (l_lm.x, l_lm.y, l_lm.z)]
    rel = pad_l(relevant_lm.astype(jnp.float32))
    ng = TILE_ROWS // 8
    gmask = (rel.reshape(-1, ng, 8, TILE_LANES).max(axis=(2, 3))
             > 0).astype(jnp.int32)
    f = _brdf_light_major(gmask, shared, light, num_lights)
    unpad = lambda x: x.reshape(num_lights, n_pad)[:, :n_rays] \
        .reshape(-1)
    return V3(unpad(f.x), unpad(f.y), unpad(f.z))
