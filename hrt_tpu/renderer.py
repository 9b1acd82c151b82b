"""The jitted frame program: trace -> shade -> (denoise -> upscale).

This is the TPU replacement for the reference's RT pipeline dispatch
(`vkCmdTraceRaysKHR`, ref: Graphics/RayTracing/RTPipeline.cpp:41-43) and
its shader stages (rgen/rchit/rmiss, ref: shaders/raytracing.slang):
one XLA program per RenderConfig, with the bounce loop unrolled to
`max_depth` (the reference's `while depth < depthMax` at
raytracing.slang:119-126) and per-pixel SIMT parallelism replaced by
SoA ray batches on the VPU.

Round-2 layout redesign: the whole shading pipeline is PLANAR — every
per-ray vector lives as three (N,) linear planes (ops/v3.py) instead of
an (N, 3) array.  Per-op xprof showed the (N, 3) form costing ~25% of
device frame time in cross-lane relayout fusions (field extraction,
dot-product reduces, scalar->vector broadcasts); planes make all of it
pure elementwise VPU work and feed the Pallas packet kernel's
(rows, 128) tiles with free reshapes.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .models import materials as M
from .models.camera import (Camera, primary_rays, primary_rays_p,
                            primary_rays_from_px_p)
from .models.lights import process_light_one
from .models.materials import MatP
from .models.scene import SceneData
from .models.sky import eval_sky_p
from .ops import intersect, rng, sampling, v3
from .ops.disney import brdf_p, schlick_weight
from .ops.lbvh import ATTR_MAT
from .ops.v3 import V3

INF = intersect.INF


class CameraArrays(NamedTuple):
    """Traced camera state (the UBO of RTPipeline.h:24-30, minus the
    inverse-transpose dance — see models/camera.py)."""

    origin: jnp.ndarray      # (3,)
    basis: jnp.ndarray       # (3, 3) rows u, v, w
    tan_half_fovy: jnp.ndarray
    aspect: jnp.ndarray


def camera_arrays(cam: Camera, config: RenderConfig) -> CameraArrays:
    return CameraArrays(*cam.ray_params(config.width, config.height))


# ---------------------------------------------------------------------------
# Trace dispatch — chooses the intersector backend.
# ---------------------------------------------------------------------------

def _ray_block_size(n: int, t: int) -> int:
    """Pick a ray block bounding the (rays x tris-chunk) intermediate."""
    for b in (65536, 32768, 16384, 8192, 4096, 2048, 1024, 512, 256, 128):
        if n % b == 0:
            return b
    return n


def _trace_closest_brute(scene: SceneData, o, d, t_min, t_max,
                         config: RenderConfig):
    n = o.shape[0]
    block = _ray_block_size(n, scene.num_triangles)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def one_block(args):
        ob, db, tb = args
        return intersect.closest_hit_bruteforce(
            ob, db, scene.tri_v0, scene.tri_e1, scene.tri_e2,
            t_min, tb, chunk=min(config.tri_chunk, scene.num_triangles))

    if block == n:
        return one_block((o, d, t_max))
    res = jax.lax.map(one_block, (o.reshape(-1, block, 3),
                                  d.reshape(-1, block, 3),
                                  t_max.reshape(-1, block)))
    return tuple(r.reshape(n) for r in res)


def trace_closest(scene: SceneData, accel, o, d, t_min, t_max,
                  config: RenderConfig, sorted_ids: bool = False):
    """Closest-hit over the whole ray batch (array API).
    Returns (t, tri, u, v); sorted_ids=True (accel paths only) returns
    BVH leaf-pool ids for Accel.attr shading."""
    mode = config.traversal
    if mode in ("bvh", "pallas", "auto") and accel is not None:
        from .ops import traversal

        return traversal.closest_hit_bvh(
            scene, accel, o, d, t_min, t_max,
            use_pallas=(mode != "bvh"), sorted_ids=sorted_ids)
    return _trace_closest_brute(scene, o, d, t_min, t_max, config)


def trace_closest_p(scene: SceneData, accel, o: V3, d: V3, t_min, t_max,
                    config: RenderConfig, sorted_ids: bool = False):
    """Planar closest-hit dispatch (o/d V3s of (N,) planes)."""
    mode = config.traversal
    if mode in ("bvh", "pallas", "auto") and accel is not None:
        from .ops import traversal

        return traversal.closest_hit_bvh_p(
            scene, accel, o, d, t_min, t_max,
            use_pallas=(mode != "bvh"), sorted_ids=sorted_ids)
    return _trace_closest_brute(scene, o.to_array(), d.to_array(),
                                t_min, t_max, config)


def trace_any(scene: SceneData, accel, o, d, t_min, t_max,
              config: RenderConfig):
    """Occlusion (shadow) rays; t_max per-ray.  Returns bool (N,)."""
    mode = config.traversal
    if (mode in ("bvh", "pallas", "auto")) and accel is not None:
        from .ops import traversal

        return traversal.any_hit_bvh(scene, accel, o, d, t_min, t_max,
                                     use_pallas=(mode in ("pallas",
                                                          "auto")))
    n = o.shape[0]
    block = _ray_block_size(n, scene.num_triangles)

    def one_block(args):
        ob, db, tb = args
        return intersect.any_hit_bruteforce(
            ob, db, scene.tri_v0, scene.tri_e1, scene.tri_e2,
            t_min, tb, chunk=min(config.tri_chunk, scene.num_triangles))

    if block == n:
        return one_block((o, d, t_max))
    res = jax.lax.map(one_block, (o.reshape(-1, block, 3),
                                  d.reshape(-1, block, 3),
                                  t_max.reshape(-1, block)))
    return res.reshape(n)


def trace_any_p(scene: SceneData, accel, o: V3, d: V3, t_min, t_max,
                config: RenderConfig):
    """Planar occlusion dispatch."""
    from .ops import tlas as tlas_mod

    if isinstance(accel, tlas_mod.TwoLevelFlat):
        return tlas_mod.any_hit_tlas(accel, o, d, t_min, t_max)
    mode = config.traversal
    if (mode in ("bvh", "pallas", "auto")) and accel is not None:
        from .ops import traversal

        return traversal.any_hit_bvh_p(scene, accel, o, d, t_min, t_max,
                                       use_pallas=(mode != "bvh"))
    return trace_any(scene, None, o.to_array(), d.to_array(), t_min,
                     t_max, config)


# ---------------------------------------------------------------------------
# Shading (the rchitMain / calculateColor stage,
# ref: shaders/raytracing.slang:72-88,135-170)
# ---------------------------------------------------------------------------

def interpolate_hit(scene: SceneData, tri_idx, u, v):
    """Gather + barycentric-interpolate hit attributes
    (ref: shaders/objects.slang:35-54).  Array-API compat helper
    (the frame program uses _shade_attrs_p); one packed gather."""
    attr = jnp.concatenate(
        [scene.nrm0, scene.nrm1, scene.nrm2,
         scene.uv0, scene.uv1, scene.uv2,
         scene.tri_mat[:, None].astype(jnp.float32)], axis=1)  # (T, 16)
    safe = jnp.maximum(tri_idx, 0)
    rows = attr[safe]                                           # (N, 16)
    w = 1.0 - u - v
    wu = u[..., None]
    wv = v[..., None]
    ww = w[..., None]
    normal = (ww * rows[:, 0:3] + wu * rows[:, 3:6]
              + wv * rows[:, 6:9])
    uv = ww * rows[:, 9:11] + wu * rows[:, 11:13] + wv * rows[:, 13:15]
    mat_id = rows[:, 15].astype(jnp.int32)
    from .ops.math3d import normalize as nrm_arr

    return nrm_arr(normal), uv, mat_id


def _hit_attr_table(accel):
    """The pre-sorted attribute table if the accel carries one
    (lbvh.Accel.attr), unwrapping any legacy wrapper with a .base."""
    if accel is None:
        return None
    base = getattr(accel, "base", accel)
    return getattr(base, "attr", None)


def _scene_attr_table(scene: SceneData):
    """Fallback attribute table in ORIGINAL triangle order, same column
    layout as Accel.attr (for brute-force / no-accel paths)."""
    base = jnp.concatenate(
        [scene.nrm0, scene.nrm1, scene.nrm2,
         scene.uv0, scene.uv1, scene.uv2,
         scene.tri_mat[:, None].astype(jnp.float32)], axis=1)
    return jnp.concatenate([base, scene.materials[scene.tri_mat]],
                           axis=1)


def _shade_attrs_p(tab, tri_idx, u, v, materials=None):
    """Hit attributes from ONE gather of the (T, 16+MAT_W) table.

    The gathered rows are transposed once to (W, N) so every field and
    material plane is a free row slice with rays in lanes (ops/v3.py).
    Returns (normal V3 [unit], mat MatP, mat_rows (N, MAT_W) for
    array-API consumers like the pbr BSDF, (tu, tv) interpolated hit
    UVs for texture sampling).

    When `materials` (the scene's (M, MAT_W) table) is passed and M is
    small, only the 16 geometry columns are gathered and the material
    planes come from a where-chain over the tiny table instead of
    riding the gather — 20 of 36 gathered+transposed columns drop
    (measured: the [N, 36] gather + [36, N] relayout cost 0.39 ms of
    the 2.45 ms bench frame and ~5.7 ms per depth at 1080p; values are
    bit-identical since select picks the same rows the gather would).
    mat_rows is then the (N,) float TEXTURE-ID plane (rows.ndim == 1
    marks the mode) — the only per-ray material consumers outside MatP
    are the texture lookup and the pbr BSDF, and callers only enable
    the select path when the pbr path is off."""
    sel = materials is not None and materials.shape[0] <= 8
    if sel:
        tab = jax.lax.optimization_barrier(tab[:, :ATTR_MAT])
    rows = tab[jnp.maximum(tri_idx, 0)]           # (N, W) single gather
    # One materialized (W, N//128, 128) relayout; every field is then a
    # contiguous slice (v3.rows_to_planes — the 2-D transposed form
    # paid ~1.4 ms PER FIELD at 1080p in slice_reduce relayouts).
    rt = v3.rows_to_planes(rows)
    w = 1.0 - u - v
    normal = v3.normalize(V3(
        w * rt[0] + u * rt[3] + v * rt[6],
        w * rt[1] + u * rt[4] + v * rt[7],
        w * rt[2] + u * rt[5] + v * rt[8]))
    tu = w * rt[9] + u * rt[11] + v * rt[13]
    tv = w * rt[10] + u * rt[12] + v * rt[14]
    if sel:
        mat_id = rt[15].astype(jnp.int32)
        planes = []
        for c in range(materials.shape[1]):
            pc = jnp.broadcast_to(materials[0, c], mat_id.shape)
            for m in range(1, materials.shape[0]):
                pc = jnp.where(mat_id == m, materials[m, c], pc)
            planes.append(pc)
        return (normal, MatP.from_rows_t(planes, base=0),
                planes[M.BASE_COLOR_TEX], (tu, tv))
    return (normal, MatP.from_rows_t(rt, base=ATTR_MAT),
            rows[:, ATTR_MAT:], (tu, tv))


def _eval_brdf_p(config: RenderConfig, mat: MatP, mat_rows, n: V3,
                 view: V3, l: V3, frame):
    """Material-model dispatch: Disney (default, parity) or the glTF
    metallic-roughness alternative (ref: shaders/pbr.slang).
    mat_rows: gathered (N, MAT_W) material rows (array-API consumers)."""
    if config.brdf == "pbr":
        from .ops import pbr

        f = pbr.bsdf_evaluate_simple(mat_rows, n.to_array(),
                                     view.to_array(), l.to_array())
        return V3.from_array(f)
    return brdf_p(mat, n, view, l, frame=frame)


def _zero3(like) -> V3:
    z = jnp.zeros_like(like)
    return V3(z, z, z)


def _nee_batch_shade(scene: SceneData, accel, mat: MatP, rows, n: V3,
                     view: V3, world_pos: V3, config: RenderConfig,
                     frame, samples):
    """Shared tail of the importance-sampled NEE paths: evaluate the
    BRDF for all S picked light samples in ONE predicated light-major
    Pallas call (ops/shade_pallas.py — sky/dead/back-facing GROUPS skip
    the Disney math entirely) and trace all S shadow batches in ONE
    light-major kernel launch, mirroring the unrolled per-light path
    (direct_lighting_p).  Replaces S separate Disney graphs + S trace
    calls — the big-scene paths VERDICT r3 #5 flagged as unpredicated.

    samples: per-sample tuples of (N,)-plane values
    (l unit V3, ldir unnormalized V3, lcol V3, lint, unb, relevant,
    inv_pdf).  Returns the sample-averaged radiance V3."""
    cat = jnp.concatenate
    s_count = len(samples)
    nrays = n.x.shape[0]
    if config.shade_pallas and config.brdf != "pbr":
        from .ops import shade_pallas

        l_lm = V3(cat([s[0].x for s in samples]),
                  cat([s[0].y for s in samples]),
                  cat([s[0].z for s in samples]))
        rel_lm = cat([s[5] for s in samples])
        f_lm = shade_pallas.brdf_light_major(mat, n, view, l_lm,
                                             rel_lm, s_count)
        fs = [f_lm.map(lambda a, i=i: a[i * nrays:(i + 1) * nrays])
              for i in range(s_count)]
    else:
        fs = [_eval_brdf_p(config, mat, rows, n, view, s[0], frame)
              for s in samples]

    so = world_pos + n * config.normal_offset
    segs = [_shadow_segment(so, world_pos, s[1], s[0], s[4], s[5],
                            config)
            for s in samples]
    if config.shadow_from_light:
        o_lm = V3(cat([o.x for o, _, _ in segs]),
                  cat([o.y for o, _, _ in segs]),
                  cat([o.z for o, _, _ in segs]))
    else:
        # Shared surface origin: `tile`, NOT per-sample concatenate —
        # the concatenate form flipped XLA's layout assignment for the
        # whole shading graph (CLAUDE.md layout hazard).
        o_lm = so.map(lambda a: jnp.tile(a, s_count))
    d_lm = V3(cat([d.x for _, d, _ in segs]),
              cat([d.y for _, d, _ in segs]),
              cat([d.z for _, d, _ in segs]))
    st_lm = cat([st for _, _, st in segs])
    occluded = trace_any_p(scene, accel, o_lm, d_lm, config.t_min,
                           st_lm, config)

    out = _zero3(n.x)
    for i, (l, ldir, lcol, lint, unb, relevant, inv_pdf) in \
            enumerate(samples):
        vis = 1.0 - occluded[i * nrays:(i + 1) * nrays].astype(
            jnp.float32)
        contrib = fs[i] * lcol * (lint * vis * inv_pdf)
        out = out + v3.where(relevant, contrib, _zero3(n.x))
    return out * (1.0 / jnp.float32(s_count))


def _direct_bvh_p(scene: SceneData, accel, mat: MatP, rows, n: V3,
                  view: V3, world_pos: V3, config: RenderConfig,
                  ray_mask, seed, frame):
    """Light-BVH NEE: O(log L) stochastic-descent light pick per sample
    (ops/lightbvh.py) — the real implementation of the LightBVHNode the
    reference declares and never uses (Scene.h:123-130).  Unbiased:
    contribution is divided by the exact descent pdf."""
    from .ops import lightbvh

    # The tree is built once at scene build (models/scene.Scene.build)
    # — rebuilding it here would re-trace the morton sort into every
    # shading program (per bounce).  Fallback for hand-built SceneData.
    tree = (scene.light_tree if scene.light_tree is not None
            else lightbvh.build_light_tree(scene.lights))
    samples = []
    for _ in range(config.light_samples):
        u, seed = rng.rand(seed)
        pick, pdf = lightbvh.sample_light(tree, world_pos, u)
        lrows = scene.lights[pick]
        ldir, lcol, lint, unb = lightbvh.process_light_rows(lrows,
                                                            world_pos)
        l = v3.normalize(ldir)
        relevant = ((v3.dot(n, l) > 0.0)
                    & (lint >= config.light_threshold)
                    & (pdf > 1e-12))
        if ray_mask is not None:
            relevant = relevant & ray_mask
        inv_pdf = 1.0 / jnp.maximum(pdf, 1e-9)
        samples.append((l, ldir, lcol, lint, unb, relevant, inv_pdf))
    out = _nee_batch_shade(scene, accel, mat, rows, n, view, world_pos,
                           config, frame, samples)
    return out, seed


def _direct_sampled_p(scene: SceneData, accel, mat: MatP, rows, n: V3,
                      view: V3, world_pos: V3, config: RenderConfig,
                      ray_mask, seed, frame):
    """Many-light NEE: importance-sample `light_samples` lights per
    shading point by unshadowed contribution (intensity x NdotL x
    luminance) — the light-hierarchy stand-in the reference's comment
    points at (raytracing.slang:76).  Shadow rays per point: S, not L.
    Past 384 lights (or with light_sampler="bvh") the O(L) weight scan
    here is replaced by the light-BVH descent (_direct_bvh_p).  The
    crossover is measured, not asymptotic (scripts/lights_ab.py, v5e,
    2-sample NEE at 512x384): the scan is pure contiguous VPU work
    while the descent pays one row-count-bound (N, 16) gather per
    level, so at 256 lights the scan still edges it (25.1 vs 27.0
    device ms) and at 1024 the tree wins 2.2x (31.2 vs 69.0)."""
    num_lights = scene.lights.shape[0]
    if (config.light_sampler == "bvh"
            or (config.light_sampler == "auto" and num_lights > 384)):
        return _direct_bvh_p(scene, accel, mat, rows, n, view,
                             world_pos, config, ray_mask, seed, frame)
    # Vectorized over lights: every per-light quantity is one (L, N)
    # array (light-major rows, rays in lanes) — no Python-unrolled
    # O(L*S) where-chains, and the CDF/pick are single cumsum/reduce
    # ops.  Selection is a one-hot masked reduce (pure VPU row math;
    # cheaper in layouts than a gather along the L axis).
    from .models.lights import process_light

    wp = jnp.stack([world_pos.x, world_pos.y, world_pos.z], -1)  # (N,3)
    ldir_a, lcol_a, lint_a, unb_a = process_light(scene.lights, wp)
    ldx, ldy, ldz = (ldir_a[..., 0].T, ldir_a[..., 1].T,
                     ldir_a[..., 2].T)                    # (L, N)
    lint_ln = lint_a.T                                    # (L, N)
    inv_len = jax.lax.rsqrt(jnp.maximum(
        ldx * ldx + ldy * ldy + ldz * ldz, 1e-24))
    lx, ly, lz = ldx * inv_len, ldy * inv_len, ldz * inv_len
    ndotl = jnp.maximum(n.x[None] * lx + n.y[None] * ly
                        + n.z[None] * lz, 0.0)            # (L, N)
    lum = (0.2126 * lcol_a[:, 0] + 0.7152 * lcol_a[:, 1]
           + 0.0722 * lcol_a[:, 2])                       # (L,)
    ws = ndotl * lint_ln * (lum[:, None] + 1e-3)
    ws = jnp.where(lint_ln >= config.light_threshold, ws, 0.0) + 1e-12
    cdf = jnp.cumsum(ws, axis=0)                          # (L, N)
    total = cdf[-1]

    liota = jnp.arange(num_lights, dtype=jnp.int32)[:, None]

    samples = []
    for _ in range(config.light_samples):
        u, seed = rng.rand(seed)
        thresh = u * total
        pick = jnp.sum((cdf[:-1] < thresh[None]).astype(jnp.int32),
                       axis=0)                            # (N,)
        onehot = liota == pick[None]                      # (L, N)

        def sel(a_ln, onehot=onehot):
            return jnp.sum(jnp.where(onehot, a_ln, 0.0), axis=0)

        def sel_l(a_l, onehot=onehot):                    # (L,) scalars
            return sel(jnp.broadcast_to(a_l[:, None], onehot.shape),
                       onehot)

        w_pick = sel(ws)
        l = V3(sel(lx), sel(ly), sel(lz))
        lcol = V3(sel_l(lcol_a[:, 0]), sel_l(lcol_a[:, 1]),
                  sel_l(lcol_a[:, 2]))
        lint = sel(lint_ln)
        relevant = w_pick > 1e-9
        if ray_mask is not None:
            relevant = relevant & ray_mask
        ldir_pick = V3(sel(ldx), sel(ldy), sel(ldz))
        unb_pick = sel_l(unb_a.astype(jnp.float32)) > 0.5
        inv_pdf = 1.0 / jnp.maximum(w_pick / total, 1e-9)
        samples.append((l, ldir_pick, lcol, lint, unb_pick, relevant,
                        inv_pdf))
    out = _nee_batch_shade(scene, accel, mat, rows, n, view, world_pos,
                           config, frame, samples)
    return out, seed



def _shadow_segment(so: V3, world_pos: V3, ldir: V3, l: V3, unb,
                    relevant, config: RenderConfig):
    """Shadow ray parameterization for the occlusion query.

    When config.shadow_from_light is set (default OFF — see config.py),
    finite-light shadow rays are traced FROM THE LIGHT toward the
    offset surface point: the same
    segment, so the same occlusion answer, but every ray in a pixel
    block then shares ONE origin — bundles become tight point-source
    frusta instead of sign-mixed converging fans (which blow up the
    frustum kernel's interval bounds and also widen classic packet
    tests).  Directions stay unnormalized (t in [t_min, 1]).
    Directional lights (unbounded reach) keep the surface-origin form.
    Returns (o, d, st).
    """
    reach = jnp.where(unb, INF, v3.length(ldir))
    if not config.shadow_from_light:
        return so, l, jnp.where(relevant, reach, -1.0)
    lo = world_pos + ldir           # the light's position
    d_back = so - lo                # light -> offset surface point
    o = v3.where(unb, so, lo)
    d = v3.where(unb, l, d_back)
    st = jnp.where(relevant, jnp.where(unb, INF, 1.0), -1.0)
    return o, d, st


def direct_lighting_p(scene: SceneData, accel, mat: MatP, rows, n: V3,
                      view: V3, world_pos: V3, config: RenderConfig,
                      ray_mask=None, seed=None, frame=None):
    """NEE over scene lights (ref: calculateColor,
    shaders/raytracing.slang:72-88): one shadow ray per light, or
    importance-sampled when config.light_samples > 0.

    The static light loop is unrolled; all L shadow batches trace in
    ONE light-major kernel call (coherent packets: adjacent pixels
    toward the same light).  ray_mask (N,): rays that actually hit a
    surface — dead rays get t_max = -1 so the packet kernel retires
    them at the root.  Returns (color V3, seed)."""
    num_lights = scene.lights.shape[0]
    if num_lights == 0:
        return _zero3(n.x), seed
    if (config.light_samples and seed is not None
            and num_lights > config.light_samples):
        return _direct_sampled_p(scene, accel, mat, rows, n, view,
                                 world_pos, config, ray_mask, seed,
                                 frame)
    if frame is None:
        frame = v3.orthonormal_basis(n)

    shadow_o = world_pos + n * config.normal_offset
    per_light = []
    for i in range(num_lights):
        ldir, lcol, lint, unb = process_light_one(scene.lights[i],
                                                  world_pos)
        l = v3.normalize(ldir)
        # A shadow ray only matters when the BRDF can be nonzero and the
        # light passes the intensity threshold (raytracing.slang:78-79).
        ndotl = v3.dot(n, l)
        relevant = (ndotl > 0.0) & (lint >= config.light_threshold)
        if ray_mask is not None:
            relevant = relevant & ray_mask
        # Directional lights shadow to infinity (testShadow's TMax,
        # ref: raytracing.slang:61); others to the light's distance.
        if config.shadow_from_light:
            # Light-origin segment (see _shadow_segment's rationale).
            # The light position is a CONSTANT broadcast — building
            # origins from per-ray arrays here flipped XLA's layout
            # assignment for the whole shading graph and resurrected
            # ~2.4 ms of pallas-boundary relayout copies (measured).
            shape = l.x.shape
            lo = V3(jnp.broadcast_to(scene.lights[i][0], shape),
                    jnp.broadcast_to(scene.lights[i][1], shape),
                    jnp.broadcast_to(scene.lights[i][2], shape))
            o_i = v3.where(unb, shadow_o, lo)
            d_i = v3.where(unb, l, shadow_o - lo)
            st = jnp.where(relevant,
                           jnp.where(unb, INF, 1.0), -1.0)
        else:
            o_i = None
            d_i = l
            reach = jnp.where(unb, INF, v3.length(ldir))
            st = jnp.where(relevant, reach, -1.0)  # -1 = dead lane
        per_light.append((d_i, st, relevant, lcol, lint, o_i, l))

    cat = jnp.concatenate
    # BRDF: one predicated Pallas call over the light-major batch
    # (sky / back-facing / sub-threshold GROUPS skip the whole Disney
    # evaluation — ops/shade_pallas.py, the SBT-dispatch analogue).
    # The pbr BSDF and explicit opt-out keep the XLA elementwise path.
    if config.shade_pallas and config.brdf != "pbr":
        from .ops import shade_pallas

        l_lm = V3(cat([p[6].x for p in per_light]),
                  cat([p[6].y for p in per_light]),
                  cat([p[6].z for p in per_light]))
        rel_lm = cat([p[2] for p in per_light])
        f_lm = shade_pallas.brdf_light_major(mat, n, view, l_lm,
                                             rel_lm, num_lights)
        nr = n.x.shape[0]
        fs = [f_lm.map(lambda a, i=i: a[i * nr:(i + 1) * nr])
              for i in range(num_lights)]
    else:
        fs = [_eval_brdf_p(config, mat, rows, n, view, p[6], frame)
              for p in per_light]

    # Shadow rays (ref: testShadow, raytracing.slang:56-70), flattened
    # LIGHT-major in one trace call.  When the batch is walk-tile
    # aligned, the lights interleave at tile/L granularity instead of
    # concatenating whole fans: every tile then traces the SAME
    # hit-point chunk toward all L lights, merging the lights'
    # overlapping walks (config.shadow_interleave; -5.4% on the bench
    # shadow pass, scripts/shadow_ilv_ab.py; bit-identical occlusion).
    from .ops import traversal_pallas as _tp

    nrays = n.x.shape[0]
    chunk = _tp.TILE // num_lights
    ilv_ok = (config.shadow_interleave and num_lights in (2, 4, 8)
              and nrays % chunk == 0 and not config.shadow_from_light
              and config.traversal in ("pallas", "auto"))
    if ilv_ok:
        n_chunks = nrays // chunk

        def ilv(planes):
            return jnp.concatenate(
                [p.reshape(n_chunks, 1, chunk) for p in planes],
                axis=1).reshape(-1)

        sd = V3(ilv([p[0].x for p in per_light]),
                ilv([p[0].y for p in per_light]),
                ilv([p[0].z for p in per_light]))
        st = ilv([p[1] for p in per_light])
        # Shared surface origins: chunk-broadcast (no transpose copy).
        so = shadow_o.map(lambda a: jnp.broadcast_to(
            a.reshape(n_chunks, 1, chunk),
            (n_chunks, num_lights, chunk)).reshape(-1))
    else:
        sd = V3(cat([p[0].x for p in per_light]),
                cat([p[0].y for p in per_light]),
                cat([p[0].z for p in per_light]))
        st = cat([p[1] for p in per_light])
        if config.shadow_from_light:
            so = V3(cat([p[5].x for p in per_light]),
                    cat([p[5].y for p in per_light]),
                    cat([p[5].z for p in per_light]))
        else:
            so = shadow_o.map(lambda a: jnp.tile(a, num_lights))
    occluded = trace_any_p(scene, accel, so, sd, config.t_min, st,
                           config)
    if ilv_ok:
        occ_l = occluded.reshape(nrays // chunk, num_lights, chunk)

    out = _zero3(n.x)
    for i, (_, _, relevant, lcol, lint, _, _) in enumerate(per_light):
        occ_i = (occ_l[:, i, :].reshape(-1) if ilv_ok
                 else occluded[i * nrays:(i + 1) * nrays])
        vis = 1.0 - occ_i.astype(jnp.float32)
        contrib = fs[i] * lcol * lint
        out = out + v3.where(relevant, contrib * vis, _zero3(n.x))
    return out, seed


def _refract_p(view: V3, n: V3, eta):
    """Snell refraction of the viewing direction about n (both unit,
    n facing the viewer).  Returns (direction V3, total_internal_mask)."""
    cos_i = v3.dot(view, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    d = view * (-eta) + n * (eta * cos_i - cos_t)
    return v3.normalize(d), tir


def _sample_bounce_p(mat: MatP, n: V3, view: V3, seed, entering, frame):
    """One-sample lobe selection: transmission (Snell + TIR), specular
    (GGX-VNDF), or diffuse (cosine) — enabling the sampler the reference
    ships disabled (ref: raytracing.slang:166-168, sampler.slang:44-51).

    `entering` — True where the ray hits the front face (sets eta).
    Returns (direction V3, weight V3, seed, transmitted_mask)."""
    u0, u1, seed = rng.rand2(seed)
    usel, seed = rng.rand(seed)
    metallic = mat.metallic
    rough = jnp.maximum(mat.roughness, M.ROUGHNESS_MIN)
    transmission = mat.transmission
    ior = jnp.maximum(mat.ior, 1.0001)
    p_spec = jnp.clip(metallic + 0.25 * (1.0 - rough), 0.0, 0.95)

    d_spec, w_spec = sampling.ggx_vndf_spherical_cap_p(mat, view, n,
                                                       u0, u1, frame)
    local_diff, _ = sampling.cosine_hemisphere_p(u0, u1)
    d_diff = v3.to_world(local_diff, n, frame)

    color = mat.color
    # Specular tint: metallic surfaces reflect their color; dielectric
    # specular is achromatic, scaled by Fresnel-ish schlick weight.
    h = v3.normalize(view + d_spec)
    fres = schlick_weight(v3.dot(d_spec, h))
    spec_col = ((color + (1.0 - color) * fres) * metallic
                + (0.04 + 0.96 * fres) * (1.0 - metallic))
    diff_col = color * (1.0 - metallic)

    take_spec = usel < p_spec
    direction = v3.where(take_spec, d_spec, d_diff)
    p = jnp.where(take_spec, jnp.maximum(p_spec, 1e-3),
                  jnp.maximum(1.0 - p_spec, 1e-3))
    weight = v3.where(take_spec, spec_col * w_spec, diff_col) * (1.0 / p)
    # Kill invalid specular samples (below-horizon reflections).
    weight = v3.where(take_spec & (w_spec <= 0.0), _zero3(usel), weight)

    # Transmission lobe (Whitted refraction): Fresnel-weighted choice
    # between refraction and mirror reflection; TIR always reflects.
    eta = jnp.where(entering, 1.0 / ior, ior)
    d_refr, tir = _refract_p(view, n, eta)
    cos_i = jnp.abs(v3.dot(view, n))
    f0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    fr = f0 + (1.0 - f0) * schlick_weight(cos_i)  # Fresnel reflectance
    u_t, seed = rng.rand(seed)
    reflect_inst = tir | (u_t < fr)
    d_mirr = v3.normalize(n * (2.0 * v3.dot(view, n)) - view)
    d_trans = v3.where(reflect_inst, d_mirr, d_refr)
    take_trans = transmission > 0.0  # per-material
    u_tsel, seed = rng.rand(seed)
    take_trans = take_trans & (u_tsel < transmission)
    transmitted = take_trans & jnp.logical_not(reflect_inst)

    direction = v3.where(take_trans, d_trans, direction)
    weight = v3.where(take_trans, color, weight)
    return direction, weight, seed, transmitted


def trace_paths(scene: SceneData, accel, o: V3, d: V3, seeds,
                config: RenderConfig, want_gbuffer: bool = False):
    """Bounded bounce loop over a planar ray batch (V3s of (N,) planes).

    Unrolled `max_depth` times (the reference's while loop with its
    wavefront re-dispatch per TraceRay).  Returns radiance V3, or
    (radiance, gbuffer dict of arrays) when want_gbuffer — first-hit
    normal / depth / albedo / world position feeding the SVGF denoiser.
    """
    n = o.x.shape[0]
    radiance = _zero3(o.x)
    throughput = V3(*(jnp.ones((n,), jnp.float32),) * 3)
    active = jnp.ones((n,), bool)
    seed = seeds
    gbuffer = None

    # Fast shading path: when the accel carries a pre-sorted attribute
    # table, trace in leaf-pool id space and shade with ONE gather
    # (no tri_perm remap, no separate material gather).
    from .ops import tlas as tlas_mod

    two_level = isinstance(accel, tlas_mod.TwoLevelFlat)
    attr = None if two_level else _hit_attr_table(accel)
    use_sorted = (attr is not None
                  and config.traversal in ("bvh", "pallas", "auto"))
    tab = attr if use_sorted or two_level else _scene_attr_table(scene)

    def _trace(o_, d_, tmax_):
        """(t, tri, inst-or-None, u, v) — two-level hits carry the
        instance id for the shading-side transform/material lookup."""
        if two_level:
            return tlas_mod.closest_hit_tlas(accel, o_, d_,
                                             config.t_min, tmax_)
        t, tri, u, v = trace_closest_p(scene, accel, o_, d_,
                                       config.t_min, tmax_, config,
                                       sorted_ids=use_sorted)
        return t, tri, None, u, v

    # Sorted-wavefront mode (config.sort_bounces): at every bounce the
    # WHOLE wavefront state co-sorts by (origin Morton | direction
    # octant) in one multi-operand lax.sort — rays stay sorted through
    # trace + shading + the light-major shadow batch, and only the
    # final radiance sorts back by the carried pixel index.  A
    # multi-operand sort moves 15 planes of 2M rays in ~10 ms device;
    # the naive argsort + per-plane gathers measured ~200 ms (TPU
    # gathers at T(1024) granularity) — the reason round-1 rejected
    # "bounce direction sort" outright.  Dead rays key to the back, so
    # whole trailing tiles retire at the BVH root.  Per-ray math is
    # order-independent: output radiance matches unsorted to float-
    # reassociation ulps (different fusion layouts).
    orig = None
    rad_px = None
    # Sort the first `cap` bounces only (default 2): Russian roulette
    # has killed most rays by depth 3, the depth-2 order is still a
    # good cluster for the survivors, and each skipped sort saves its
    # ~14 ms (1080p) of lax.sort time.  HRT_SORT_CAP is a measurement
    # knob (scripts-level A/B of staleness vs sort cost).
    sort_cap = int(os.environ.get("HRT_SORT_CAP", "2"))
    for depth in range(config.max_depth):
        if config.sort_bounces and 0 < depth <= sort_cap:
            from .ops import wavefront

            if orig is None:
                orig = jnp.arange(n, dtype=jnp.uint32)
            DEAD = jnp.uint32(0xFFFFFFFF)
            okey = wavefront.bounce_sort_key_p(o, d)
            # Live keys shift right one bit so DEAD can't collide.
            key = jnp.where(active, okey >> jnp.uint32(1), DEAD)
            first = rad_px is None
            if first:
                # Depth-0 radiance stays in a pixel-order buffer and
                # skips EVERY sort (3 fewer operands in the first
                # 15-plane sort, ~2.8 ms at 1080p); the carried
                # accumulator restarts at zero (order-independent) and
                # only the final orig-keyed sort moves it.  Radiance
                # arithmetic is unchanged up to float reassociation.
                rad_px = radiance
                radiance = _zero3(o.x)
            ops = [key, o.x, o.y, o.z, d.x, d.y, d.z, seed,
                   throughput.x, throughput.y, throughput.z]
            if not first:
                ops += [radiance.x, radiance.y, radiance.z]
            ops.append(orig)
            (key_, ox_, oy_, oz_, dx_, dy_, dz_, seed,
             tx_, ty_, tz_, *rest) = jax.lax.sort(
                ops, dimension=0, is_stable=False, num_keys=1)
            if first:
                (orig,) = rest
            else:
                rx_, ry_, rz_, orig = rest
                radiance = V3(rx_, ry_, rz_)
            o, d = V3(ox_, oy_, oz_), V3(dx_, dy_, dz_)
            throughput = V3(tx_, ty_, tz_)
            active = key_ != DEAD  # rides the key, not its own operand
        # Retired rays trace with t_max = -1: the packet kernel drops
        # them at the root, and fully-dead tiles exit in one step.
        t_max = INF if depth == 0 else jnp.where(active, INF, -1.0)
        # Bounce-depth traces (closest AND the NEE shadow batch below)
        # use smaller independent walk tiles: the sorted bounce
        # wavefront is still incoherent enough that a 64-ray union
        # walk saturates the tree, making the per-visit vector node
        # tests the wall; 16-row walks cut them ~4x at flat crossing
        # counts (scripts/rows_ab.py, measured).
        from .ops import traversal_pallas as _tp

        bounce_rows = (int(os.environ.get("HRT_W8_BOUNCE_ROWS", "0"))
                       if depth > 0 else 0)
        from contextlib import nullcontext

        rows_ctx = (_tp.walk_rows(bounce_rows) if bounce_rows
                    else nullcontext())
        with rows_ctx:
            t, tri, inst, u, v = _trace(o, d, t_max)
        hit = (tri >= 0) & active

        # Miss: sky radiance (rmissMain; black when sky disabled,
        # ref: raytracing.slang:172-176).
        sky_rad = eval_sky_p(scene.sky, d, enabled=config.sky)
        radiance = radiance + v3.where(active & ~hit,
                                       throughput * sky_rad,
                                       _zero3(o.x))

        if two_level:
            nrm, mat, rows, uvs = tlas_mod.shade_attrs_tlas(
                accel, scene.materials, tri, inst, u, v)
        else:
            # The narrow-gather material-select path needs the per-ray
            # material rows to be dead outside MatP/texture lookups:
            # true whenever the pbr BSDF (the one mat_rows consumer in
            # shading) is off.
            sel_mats = (scene.materials
                        if config.brdf != "pbr" else None)
            nrm, mat, rows, uvs = _shade_attrs_p(tab, tri, u, v,
                                                 materials=sel_mats)
        if scene.textures is not None and scene.textures.shape[0] > 0:
            # Base-color texture modulation (models/textures.py; the
            # UV channel the reference plumbs but never consumes,
            # ref: objects.slang:50-53).
            from .models import textures as tex_mod

            tex_id = (rows if rows.ndim == 1
                      else rows[:, M.BASE_COLOR_TEX]).astype(jnp.int32)
            tx, ty, tz = tex_mod.sample_texture_p(
                scene.textures, tex_id, uvs[0], uvs[1])
            mat = mat._replace(color=mat.color * V3(tx, ty, tz))
        world_pos = o + d * t
        view = -d  # toward viewer
        # Front-face test before the flip (drives refraction eta).
        entering = v3.dot(nrm, view) >= 0.0
        # Flip normal to face the viewer (ref: raytracing.slang:157-158).
        nrm = v3.where(entering, nrm, -nrm)

        # One shading frame per ray, shared across lights and samplers.
        frame = v3.orthonormal_basis(nrm)
        rows_ctx = (_tp.walk_rows(bounce_rows) if bounce_rows
                    else nullcontext())
        with rows_ctx:  # bounce-depth NEE shadow fans are incoherent too
            direct, seed = direct_lighting_p(scene, accel, mat, rows,
                                             nrm, view, world_pos,
                                             config, ray_mask=hit,
                                             seed=seed, frame=frame)
        emissive = mat.emissive * mat.emission_strength
        radiance = radiance + v3.where(hit,
                                       throughput * (direct + emissive),
                                       _zero3(o.x))

        if want_gbuffer and depth == 0:
            zero = _zero3(o.x)
            gbuffer = {
                "normal": v3.where(hit, nrm, zero).to_array(),
                "depth": jnp.where(hit, t, jnp.float32(0.0)),
                "albedo": v3.where(hit, mat.color,
                                   V3(*(jnp.ones((n,),
                                                 jnp.float32),) * 3))
                .to_array(),
                "world_pos": v3.where(hit, world_pos, zero).to_array(),
                "hit": hit.astype(jnp.float32),
            }

        if not config.indirect or depth + 1 == config.max_depth:
            break

        new_d, weight, seed, transmitted = _sample_bounce_p(
            mat, nrm, view, seed, entering, frame)
        throughput = throughput * weight
        side = jnp.where(transmitted, -1.0, 1.0)
        o = world_pos + nrm * (side * config.bounce_offset)
        d = new_d
        alive = v3.max_component(throughput) > 1e-5
        active = active & hit & alive

        if config.russian_roulette and depth + 1 >= config.rr_start_depth:
            p_cont = jnp.clip(v3.max_component(throughput), 0.05, 0.95)
            u_rr, seed = rng.rand(seed)
            survive = u_rr < p_cont
            throughput = throughput * (1.0 / p_cont)
            active = active & survive

        # Deactivated rays keep tracing harmlessly with throughput 0 —
        # static shapes, no compaction needed at this scale.
        throughput = v3.where(active, throughput, _zero3(o.x))

    if orig is not None:
        # Back to pixel order: one co-sort by the carried pixel index
        # (unique key, so the result is deterministic), then fold the
        # never-sorted depth-0 pixel-order radiance back in.
        _, rx_, ry_, rz_ = jax.lax.sort(
            [orig, radiance.x, radiance.y, radiance.z],
            dimension=0, is_stable=False, num_keys=1)
        radiance = V3(rx_, ry_, rz_)
        if rad_px is not None:
            radiance = radiance + rad_px

    if want_gbuffer:
        if gbuffer is None:  # max_depth == 0 edge case
            gbuffer = {
                "normal": jnp.zeros((n, 3), jnp.float32),
                "depth": jnp.zeros((n,), jnp.float32),
                "albedo": jnp.ones((n, 3), jnp.float32),
                "world_pos": jnp.zeros((n, 3), jnp.float32),
                "hit": jnp.zeros((n,), jnp.float32),
            }
        return radiance, gbuffer
    return radiance


# ---------------------------------------------------------------------------
# Frame entry
# ---------------------------------------------------------------------------

def _primary_setup(accel, cam: CameraArrays, rows: int, w: int, y0,
                   config: RenderConfig, want_static: bool):
    """Blocked pixel-index planes + (when want_static, i.e. no jitter)
    the camera rays themselves — everything about the primary bundle
    that does NOT depend on the frame index.  render_frames hoists this
    out of its frames-in-flight lax.scan so static-camera batches pay
    raygen once per dispatch instead of once per frame (the blocked
    raygen + walk-block interleave fusions measured ~0.25 ms of the
    2.45 ms bench frame).  Returns (px, py, unb, o, d) with o/d None
    when not want_static."""
    from .ops import traversal_pallas, wavefront

    bh = traversal_pallas.TILE_ROWS
    bw = traversal_pallas.TILE_LANES
    # Pixel-block reorder: each traversal tile then sees a compact
    # image block instead of a thin strip — measured ~30% fewer leaf
    # visits; square 32x32 blocks per (8,128) ray GROUP are also the
    # wide8 kernel's per-group predication granularity (strip groups
    # span the whole image width and predicate nothing).  Only the
    # PIXEL-INDEX planes are reordered — o/d/seeds are generated
    # directly in blocked order (primary_rays_from_px_p), so the only
    # inverse transpose is the final radiance/G-buffer unblock
    # (the per-plane 6-D transposes measured ~0.34 ms/frame).
    want_block = (config.block_reorder
                  and config.traversal in ("pallas", "auto")
                  and accel is not None)
    geom = None
    if want_block and traversal_pallas.WALKS > 1:
        g = wavefront.walk_block_geometry(bh, traversal_pallas.WALKS)
        if (g is not None and rows % (g[2] * g[0]) == 0
                and w % (g[3] * g[1]) == 0):
            geom = g
    elif (want_block
          and traversal_pallas.use_wide8(getattr(accel, "base", accel))
          and bh % 8 == 0 and bh > 8):
        g = wavefront.walk_block_geometry(8, bh // 8)
        if (g is not None and rows % (g[2] * g[0]) == 0
                and w % (g[3] * g[1]) == 0):
            geom = g
    blocked = want_block and (geom is not None
                              or (rows % bh == 0 and w % bw == 0))
    if blocked and geom is not None:
        tob = lambda x: wavefront.to_walk_blocks(x, rows, w, *geom)
        unb = lambda x: wavefront.from_walk_blocks(x, rows, w, *geom)
    elif blocked:
        tob = lambda x: wavefront.to_blocks(x, rows, w, bh, bw)
        unb = lambda x: wavefront.from_blocks(x, rows, w, bh, bw)
    else:
        tob = unb = lambda x: x

    # Pixel-coordinate planes in traversal order.  NOTE layout hazard:
    # deriving px/py analytically from a 1-D iota (wavefront.
    # walk_block_pixels — exact, and no transpose) flips XLA's layout
    # assignment for the ENTIRE shading graph to 1-D T(1024) and costs
    # +1.7 ms/frame in relayout fusions (measured; same failure mode as
    # the shadow-origin concatenate incident, CLAUDE.md).  The 6-D
    # transpose of the two index planes (~0.15 ms) is what anchors the
    # downstream 2-D tiled layouts — keep it.
    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.uint32)[None, :],
                          (rows, w)).reshape(-1)
    py = jnp.broadcast_to(jnp.arange(rows, dtype=jnp.uint32)
                          [:, None], (rows, w)).reshape(-1)
    px, py = tob(px), tob(py)
    py = jnp.asarray(y0, jnp.uint32) + py
    o = d = None
    if want_static:
        o, d = primary_rays_from_px_p(
            cam.origin, cam.basis, cam.tan_half_fovy, cam.aspect,
            w, config.height, px.astype(jnp.float32),
            py.astype(jnp.float32))
    return px, py, unb, o, d


def render_rows(scene: SceneData, accel, cam: CameraArrays,
                frame: jnp.ndarray, y0, rows: int,
                config: RenderConfig, want_gbuffer: bool = False,
                _pre=None):
    """Render a horizontal band of `rows` rows starting at y0.

    The tile primitive for multi-chip pixel sharding (parallel/tiles.py);
    y0 may be traced (jax.lax.axis_index inside shard_map).
    Returns (rows, W, 3) radiance — plus a (rows, W, C) G-buffer dict
    when want_gbuffer (first-sample first-hit attributes).
    _pre: hoisted _primary_setup output (render_frames' scan).
    """
    w = config.width
    if _pre is None:
        _pre = _primary_setup(accel, cam, rows, w, y0, config,
                              want_static=not config.jitter)
    px, py, unb, o_s, d_s = _pre
    seeds = rng.pixel_seed(px, py, frame)

    acc = _zero3(jnp.zeros((rows * w,), jnp.float32))
    gbuffer = None
    for s in range(config.spp):
        seeds_s = seeds + jnp.uint32((s * 0x9E3779B9) & 0xFFFFFFFF)
        if config.jitter:
            jx, seeds_s = rng.rand(seeds_s)
            jy, seeds_s = rng.rand(seeds_s)
            # frame 0 uses the pixel center (ref: raytracing.slang:97).
            is_f0 = frame == 0
            pxf = px.astype(jnp.float32) + jnp.where(is_f0, 0.5, jx)
            pyf = py.astype(jnp.float32) + jnp.where(is_f0, 0.5, jy)
            o, d = primary_rays_from_px_p(
                cam.origin, cam.basis, cam.tan_half_fovy, cam.aspect,
                w, config.height, pxf, pyf)
        else:
            o, d = o_s, d_s

        take_gb = want_gbuffer and s == 0
        out = trace_paths(scene, accel, o, d, seeds_s, config,
                          want_gbuffer=take_gb)
        rad = out[0] if take_gb else out
        if take_gb:
            gbuffer = out[1]
        acc = acc + rad
    acc = acc.map(unb)
    if gbuffer is not None:
        gbuffer = {k: unb(v) for k, v in gbuffer.items()}
    img = (acc * (1.0 / jnp.float32(config.spp))).to_array() \
        .reshape(rows, w, 3)
    if want_gbuffer:
        gbuffer = {
            k: v.reshape((rows, w) + v.shape[1:])
            for k, v in gbuffer.items()
        }
        return img, gbuffer
    return img


@functools.partial(jax.jit, static_argnames=("config", "k"))
def render_frames(scene: SceneData, accel, cam: CameraArrays,
                  frame0: jnp.ndarray, k: int,
                  config: RenderConfig) -> jnp.ndarray:
    """Render k consecutive frames in ONE dispatch -> (k, H, W, 3).

    The TPU analogue of the reference's frames-in-flight overlap
    (MAX_FRAMES_IN_FLIGHT=2, ref: Graphics/vulkan_core/SwapChain.h:8,
    SwapChain.cpp:45-131): device-side lax.scan amortizes the per-
    dispatch host round-trip (measured ~5 ms through the axon tunnel)
    over k frames.  Frame index feeds the per-pixel seed, so this is
    the progressive-accumulation / animation hot loop."""
    frame0 = jnp.asarray(frame0, jnp.uint32)
    # Frame-invariant primaries (blocked pixel planes; camera rays too
    # when jitter is off) hoist out of the scan — computed once per
    # k-frame dispatch instead of per frame.
    pre = _primary_setup(accel, cam, config.height, config.width, 0,
                         config, want_static=not config.jitter)

    def step(carry, i):
        img = render_rows(scene, accel, cam, frame0 + i, 0,
                          config.height, config, _pre=pre)
        return carry, img

    _, imgs = jax.lax.scan(step, 0, jnp.arange(k, dtype=jnp.uint32))
    return imgs


@functools.partial(jax.jit, static_argnames=("config",))
def render_frame(scene: SceneData, accel, cam: CameraArrays,
                 frame: jnp.ndarray, config: RenderConfig) -> jnp.ndarray:
    """Render one frame -> (H, W, 3) linear radiance.

    The whole trace->shade pipeline is one XLA program; `frame` feeds
    the per-pixel seed (ref: rgenMain, raytracing.slang:90-133).
    """
    return render_rows(scene, accel, cam, frame, 0, config.height, config)


def render(scene_obj, cam: Camera, config: RenderConfig, accel=None,
           frame: int = 0):
    """Convenience host entry: build scene if needed, render one frame."""
    from .models.scene import Scene

    scene = scene_obj.build() if isinstance(scene_obj, Scene) else scene_obj
    cams = camera_arrays(cam, config)
    img = render_frame(scene, accel, cams, jnp.uint32(frame), config)
    return jax.device_get(img)
