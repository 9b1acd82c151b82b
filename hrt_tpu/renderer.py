"""The jitted frame program: trace -> shade -> (denoise -> upscale).

This is the TPU replacement for the reference's RT pipeline dispatch
(`vkCmdTraceRaysKHR`, ref: Graphics/RayTracing/RTPipeline.cpp:41-43) and
its shader stages (rgen/rchit/rmiss, ref: shaders/raytracing.slang):
one XLA program per RenderConfig, with the bounce loop unrolled to
`max_depth` (the reference's `while depth < depthMax` at
raytracing.slang:119-126) and per-pixel SIMT parallelism replaced by
SoA ray batches on the VPU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .models import materials as M
from .models.camera import Camera, primary_rays
from .models.lights import process_light
from .models.scene import SceneData
from .models.sky import eval_sky
from .ops import intersect, rng, sampling
from .ops.disney import brdf, schlick_weight
from .ops.math3d import dot, length, normalize, square

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


def trace_closest(scene: SceneData, accel, o, d, t_min, t_max,
                  config: RenderConfig, sorted_ids: bool = False):
    """Closest-hit over the whole ray batch. Returns (t, tri, u, v).

    sorted_ids=True (accel paths only) returns BVH leaf-pool triangle
    ids for Accel.attr shading, skipping the per-ray tri_perm remap."""
    mode = config.traversal
    if mode in ("bvh", "pallas") and accel is not None:
        from .ops import traversal

        return traversal.closest_hit_bvh(
            scene, accel, o, d, t_min, t_max,
            use_pallas=(mode == "pallas"), sorted_ids=sorted_ids)
    if mode == "auto" and accel is not None:
        from .ops import traversal

        return traversal.closest_hit_bvh(scene, accel, o, d, t_min, t_max,
                                         use_pallas=True,
                                         sorted_ids=sorted_ids)

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


# ---------------------------------------------------------------------------
# Shading (the rchitMain / calculateColor stage,
# ref: shaders/raytracing.slang:72-88,135-170)
# ---------------------------------------------------------------------------

def interpolate_hit(scene: SceneData, tri_idx, u, v):
    """Gather + barycentric-interpolate hit attributes
    (ref: shaders/objects.slang:35-54).

    All per-triangle attributes are packed into one (T, 16) table so
    the hot path issues a SINGLE gather per hit instead of seven
    (normals x3, uvs x3, material id); the pack itself is a cheap
    O(T) concat that XLA amortizes."""
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
    return normalize(normal), uv, mat_id


def _hit_attr_table(accel):
    """The pre-sorted attribute table if the accel carries one
    (lbvh.Accel.attr), unwrapping a WideAccel."""
    if accel is None:
        return None
    base = getattr(accel, "base", accel)
    return getattr(base, "attr", None)


def hit_attrs_sorted(attr, tri_idx, u, v):
    """interpolate_hit + material fetch in ONE gather of the pre-sorted
    attribute table (tri_idx in BVH leaf-pool order).  Returns
    (normal, uv, mat_rows)."""
    from .ops.lbvh import ATTR_MAT

    rows = attr[jnp.maximum(tri_idx, 0)]          # (N, 16 + MAT_W)
    w = 1.0 - u - v
    wu, wv, ww = u[..., None], v[..., None], w[..., None]
    normal = (ww * rows[:, 0:3] + wu * rows[:, 3:6] + wv * rows[:, 6:9])
    uv = ww * rows[:, 9:11] + wu * rows[:, 11:13] + wv * rows[:, 13:15]
    return normalize(normal), uv, rows[:, ATTR_MAT:]


def eval_brdf(config: RenderConfig, mat, n, v, l, frame=None):
    """Material-model dispatch: Disney (default, parity) or the glTF
    metallic-roughness alternative (ref: shaders/pbr.slang)."""
    if config.brdf == "pbr":
        from .ops import pbr

        return pbr.bsdf_evaluate_simple(mat, n, v, l)
    return brdf(mat, n, v, l, frame=frame)


def _direct_sampled(scene: SceneData, accel, mat_rows, n, view,
                    world_pos, config: RenderConfig, ray_mask, seed):
    """Many-light NEE: importance-sample `light_samples` lights per
    shading point by unshadowed contribution (intensity x NdotL x
    luminance) — the light-hierarchy stand-in the reference's comment
    points at (raytracing.slang:76).  Shadow rays per point: S, not L."""
    from .ops.math3d import luminance

    nrays = world_pos.shape[0]
    ar = jnp.arange(nrays)
    ldir_all, lcol_all, lint_all, unb_all = process_light(
        scene.lights, world_pos)
    l_all = normalize(ldir_all)                       # (N, L, 3)
    ndotl = jnp.maximum(jnp.sum(n[:, None, :] * l_all, -1), 0.0)
    w = ndotl * lint_all * (luminance(lcol_all)[None] + 1e-3)
    w = jnp.where(lint_all >= config.light_threshold, w, 0.0) + 1e-12
    cdf = jnp.cumsum(w, axis=1)
    total = cdf[:, -1]

    out = jnp.zeros((nrays, 3), jnp.float32)
    s_count = config.light_samples
    for _ in range(s_count):
        u, seed = rng.rand(seed)
        pick = jnp.argmax(cdf >= (u * total)[:, None], axis=1)
        pdf = w[ar, pick] / total
        l = l_all[ar, pick]
        f = eval_brdf(config, mat_rows, n, view, l)
        relevant = (w[ar, pick] > 1e-9)
        if ray_mask is not None:
            relevant = relevant & ray_mask
        so = world_pos + n * config.normal_offset
        reach = jnp.where(unb_all[pick], INF,
                          length(ldir_all[ar, pick]))
        st = jnp.where(relevant, reach, -1.0)
        occluded = trace_any(scene, accel, so, l, config.t_min, st,
                             config)
        vis = 1.0 - occluded.astype(jnp.float32)
        contrib = (f * lcol_all[pick] * lint_all[ar, pick, None]
                   * vis[:, None] / jnp.maximum(pdf, 1e-9)[:, None])
        out = out + jnp.where(relevant[:, None], contrib, 0.0)
    return out / jnp.float32(s_count), seed


def direct_lighting(scene: SceneData, accel, mat_rows, n, view, world_pos,
                    config: RenderConfig, ray_mask=None, seed=None):
    """NEE over scene lights (ref: calculateColor,
    shaders/raytracing.slang:72-88): one shadow ray per light, or
    importance-sampled when config.light_samples > 0.

    ray_mask (N,) bool: rays that actually hit a surface — dead rays get
    t_max = -1 so the packet kernel retires them at the root (a whole
    dead tile exits in one iteration).  Returns (color, seed)."""
    num_lights = scene.lights.shape[0]
    if num_lights == 0:
        return jnp.zeros(world_pos.shape, jnp.float32), seed
    if (config.light_samples and seed is not None
            and num_lights > config.light_samples):
        return _direct_sampled(scene, accel, mat_rows, n, view,
                               world_pos, config, ray_mask, seed)

    ldir, lcol, lint, unbounded = process_light(scene.lights, world_pos)
    l = normalize(ldir)                               # (N, L, 3)
    # One shading frame per ray, shared across all lights.
    from .ops.math3d import orthonormal_basis

    t_f, b_f = orthonormal_basis(n)
    frame = (t_f[:, None, :], b_f[:, None, :])
    f = eval_brdf(config, mat_rows[:, None, :], n[:, None, :],
                  view[:, None, :], l, frame=frame)

    # A shadow ray only matters when the BRDF can be nonzero and the
    # light passes the intensity threshold (raytracing.slang:78-79).
    ndotl = jnp.sum(n[:, None, :] * l, -1)
    relevant = (ndotl > 0.0) & (lint >= config.light_threshold)
    if ray_mask is not None:
        relevant = relevant & ray_mask[:, None]

    # Shadow rays (ref: testShadow, raytracing.slang:56-70).  Flattened
    # LIGHT-major so each traversal tile sees rays toward one light from
    # adjacent pixels — much more coherent packets than ray-major.
    shadow_o = world_pos + n * config.normal_offset
    nrays = world_pos.shape[0]
    so = jnp.broadcast_to(shadow_o[None, :, :],
                          (num_lights, nrays, 3)).reshape(-1, 3)
    sd = jnp.swapaxes(l, 0, 1).reshape(-1, 3)
    # Directional lights shadow to infinity (testShadow's TMax,
    # ref: raytracing.slang:61); others to the light's distance.
    reach = jnp.where(unbounded, INF, length(ldir))
    st = jnp.where(relevant, reach, -1.0)  # -1 = dead lane
    st = jnp.swapaxes(st, 0, 1).reshape(-1)
    occluded = trace_any(scene, accel, so, sd, config.t_min,
                         st, config)
    visible = 1.0 - jnp.swapaxes(
        occluded.reshape(num_lights, nrays), 0, 1).astype(jnp.float32)

    contrib = f * lcol[None] * lint[..., None] * visible[..., None]
    return jnp.sum(jnp.where(relevant[..., None], contrib, 0.0),
                   axis=1), seed


def _refract(view, n, eta):
    """Snell refraction of the viewing direction about n (both unit,
    n facing the viewer).  Returns (direction, total_internal_mask)."""
    cos_i = dot(view, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    d = (-eta[..., None] * view
         + (eta * cos_i - cos_t)[..., None] * n)
    return normalize(d), tir


def _sample_bounce(mat_rows, n, view, seed, entering):
    """One-sample lobe selection: transmission (Snell + TIR), specular
    (GGX-VNDF), or diffuse (cosine) — enabling the sampler the reference
    ships disabled (ref: raytracing.slang:166-168, sampler.slang:44-51).

    `entering` — True where the ray hits the front face (sets eta).
    Returns (direction, weight, seed, transmitted_mask)."""
    u0, u1, seed = rng.rand2(seed)
    usel, seed = rng.rand(seed)
    metallic = mat_rows[:, M.METALLIC]
    rough = jnp.maximum(mat_rows[:, M.ROUGHNESS], M.ROUGHNESS_MIN)
    transmission = mat_rows[:, M.TRANSMISSION]
    ior = jnp.maximum(mat_rows[:, M.IOR], 1.0001)
    p_spec = jnp.clip(metallic + 0.25 * (1.0 - rough), 0.0, 0.95)

    d_spec, w_spec = sampling.ggx_vndf_spherical_cap(mat_rows, view, n, u0, u1)
    local_diff, _ = sampling.cosine_hemisphere(u0, u1)
    from .ops.math3d import to_world

    d_diff = to_world(local_diff, n)

    color = mat_rows[:, M.COLOR]
    # Specular tint: metallic surfaces reflect their color; dielectric
    # specular is achromatic, scaled by Fresnel-ish schlick weight.
    h = normalize(view + d_spec)
    fres = schlick_weight(dot(d_spec, h))[..., None]
    spec_col = (color + (1.0 - color) * fres) * metallic[:, None] + \
        (0.04 + 0.96 * fres) * (1.0 - metallic[:, None])
    diff_col = color * (1.0 - metallic[:, None])

    take_spec = (usel < p_spec)[:, None]
    direction = jnp.where(take_spec, d_spec, d_diff)
    p = jnp.where(usel < p_spec, jnp.maximum(p_spec, 1e-3),
                  jnp.maximum(1.0 - p_spec, 1e-3))[:, None]
    weight = jnp.where(take_spec, spec_col * w_spec[:, None], diff_col) / p
    # Kill invalid specular samples (below-horizon reflections).
    weight = jnp.where(take_spec & (w_spec[:, None] <= 0.0), 0.0, weight)

    # Transmission lobe (Whitted refraction): Fresnel-weighted choice
    # between refraction and mirror reflection; TIR always reflects.
    eta = jnp.where(entering, 1.0 / ior, ior)
    d_refr, tir = _refract(view, n, eta)
    cos_i = jnp.abs(dot(view, n))
    f0 = square((1.0 - ior) / (1.0 + ior))
    fr = f0 + (1.0 - f0) * schlick_weight(cos_i)  # Fresnel reflectance
    u_t, seed = rng.rand(seed)
    reflect_inst = tir | (u_t < fr)
    d_mirr = normalize(2.0 * dot(view, n)[..., None] * n - view)
    d_trans = jnp.where(reflect_inst[:, None], d_mirr, d_refr)
    take_trans = (usel >= 0.0) & (transmission > 0.0)  # per-material
    u_tsel, seed = rng.rand(seed)
    take_trans = take_trans & (u_tsel < transmission)
    transmitted = take_trans & jnp.logical_not(reflect_inst)

    direction = jnp.where(take_trans[:, None], d_trans, direction)
    weight = jnp.where(take_trans[:, None], color, weight)
    return direction, weight, seed, transmitted


def trace_paths(scene: SceneData, accel, o, d, seeds,
                config: RenderConfig, want_gbuffer: bool = False):
    """Bounded bounce loop over a flat ray batch (N, 3).

    Unrolled `max_depth` times (the reference's while loop with its
    wavefront re-dispatch per TraceRay).  Returns radiance (N, 3), or
    (radiance, gbuffer dict) when want_gbuffer — first-hit normal /
    depth / albedo / world position feeding the SVGF denoiser.
    """
    n = o.shape[0]
    radiance = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)
    seed = seeds
    gbuffer = None

    # Fast shading path: when the accel carries a pre-sorted attribute
    # table, trace in leaf-pool id space and shade with ONE gather
    # (no tri_perm remap, no separate material gather).
    attr = _hit_attr_table(accel)
    use_sorted = (attr is not None
                  and config.traversal in ("bvh", "pallas", "auto"))

    for depth in range(config.max_depth):
        # Retired rays trace with t_max = -1: the packet kernel drops
        # them at the root, and fully-dead tiles exit in one step.
        t_max = INF if depth == 0 else jnp.where(active, INF, -1.0)
        if config.sort_bounces and depth > 0:
            # Wavefront re-sort: cluster live bounce rays by direction
            # octant so packets stay coherent (the SIMT-reconvergence
            # analogue, SURVEY.md H3).  Dead rays sort to the back so
            # whole trailing tiles retire instantly.
            from .ops import wavefront

            okey = wavefront.direction_order_key(d)
            key = jnp.where(active, okey, jnp.float32(1e9))
            perm = jnp.argsort(key)
            inv = jnp.argsort(perm)
            t, tri, u, v = trace_closest(
                scene, accel, o[perm], d[perm], config.t_min,
                t_max[perm], config, sorted_ids=use_sorted)
            t, tri, u, v = t[inv], tri[inv], u[inv], v[inv]
        else:
            t, tri, u, v = trace_closest(
                scene, accel, o, d, config.t_min, t_max, config,
                sorted_ids=use_sorted)
        hit = (tri >= 0) & active

        # Miss: sky radiance (rmissMain; black when sky disabled,
        # ref: raytracing.slang:172-176).
        sky_rad = eval_sky(scene.sky, d, enabled=config.sky)
        radiance = radiance + jnp.where(
            (active & ~hit)[:, None], throughput * sky_rad, 0.0)

        if use_sorted:
            nrm, uv, mat_rows = hit_attrs_sorted(attr, tri, u, v)
        else:
            nrm, uv, mat_id = interpolate_hit(scene, tri, u, v)
            mat_rows = scene.materials[mat_id]
        world_pos = o + t[:, None] * d
        view = -d  # toward viewer
        # Front-face test before the flip (drives refraction eta).
        entering = dot(nrm, view) >= 0.0
        # Flip normal to face the viewer (ref: raytracing.slang:157-158).
        nrm = jnp.where(entering[:, None], nrm, -nrm)

        direct, seed = direct_lighting(scene, accel, mat_rows, nrm, view,
                                       world_pos, config, ray_mask=hit,
                                       seed=seed)
        emissive = (mat_rows[:, M.EMISSIVE]
                    * mat_rows[:, M.EMISSION_STRENGTH, None])
        radiance = radiance + jnp.where(
            hit[:, None], throughput * (direct + emissive), 0.0)

        if want_gbuffer and depth == 0:
            gbuffer = {
                "normal": jnp.where(hit[:, None], nrm, 0.0),
                "depth": jnp.where(hit, t, jnp.float32(0.0)),
                "albedo": jnp.where(hit[:, None],
                                    mat_rows[:, M.COLOR], 1.0),
                "world_pos": jnp.where(hit[:, None], world_pos, 0.0),
                "hit": hit.astype(jnp.float32),
            }

        if not config.indirect or depth + 1 == config.max_depth:
            break

        new_d, weight, seed, transmitted = _sample_bounce(
            mat_rows, nrm, view, seed, entering)
        throughput = throughput * weight
        side = jnp.where(transmitted[:, None], -1.0, 1.0)
        o = world_pos + nrm * side * config.bounce_offset
        d = new_d
        alive = jnp.max(throughput, axis=-1) > 1e-5
        active = active & hit & alive

        if config.russian_roulette and depth + 1 >= config.rr_start_depth:
            p_cont = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
            u_rr, seed = rng.rand(seed)
            survive = u_rr < p_cont
            throughput = throughput / p_cont[:, None]
            active = active & survive

        # Deactivated rays keep tracing harmlessly with throughput 0 —
        # static shapes, no compaction needed at this scale.
        throughput = jnp.where(active[:, None], throughput, 0.0)

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

def render_rows(scene: SceneData, accel, cam: CameraArrays,
                frame: jnp.ndarray, y0, rows: int,
                config: RenderConfig, want_gbuffer: bool = False):
    """Render a horizontal band of `rows` rows starting at y0.

    The tile primitive for multi-chip pixel sharding (parallel/tiles.py);
    y0 may be traced (jax.lax.axis_index inside shard_map).
    Returns (rows, W, 3) radiance — plus a (rows, W, C) G-buffer dict
    when want_gbuffer (first-sample first-hit attributes).
    """
    w = config.width
    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.uint32)[None, :],
                          (rows, w))
    py = jnp.broadcast_to(
        jnp.asarray(y0, jnp.uint32) + jnp.arange(rows, dtype=jnp.uint32)
        [:, None], (rows, w))
    seeds = rng.pixel_seed(px, py, frame)

    acc = jnp.zeros((rows * w, 3), jnp.float32)
    for s in range(config.spp):
        seeds_s = seeds + jnp.uint32(s * 0x9E3779B9)
        if config.jitter:
            jx, seeds_s = rng.rand(seeds_s)
            jy, seeds_s = rng.rand(seeds_s)
            # frame 0 uses the pixel center (ref: raytracing.slang:97).
            is_f0 = frame == 0
            jit = jnp.stack([jnp.where(is_f0, 0.5, jx),
                             jnp.where(is_f0, 0.5, jy)], axis=-1)
        else:
            jit = None
        o, d = primary_rays(cam.origin, cam.basis, cam.tan_half_fovy,
                            cam.aspect, w, config.height, jitter=jit,
                            y0=y0, rows=rows)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        seeds_flat = seeds_s.reshape(-1)

        # Pixel-block reorder: each traversal tile then sees a compact
        # image block, maximizing packet coherence (ops/wavefront.py).
        from .ops import traversal_pallas, wavefront

        bh = traversal_pallas.TILE_ROWS
        bw = traversal_pallas.TILE_LANES
        # Pixel-block reorder: each traversal tile then sees a compact
        # (bh, bw) image block instead of a thin strip — measured ~30%
        # fewer leaf visits.  Pure reshape/transpose, no gathers.
        blocked = (config.block_reorder
                   and config.traversal in ("pallas", "auto")
                   and accel is not None
                   and rows % bh == 0 and w % bw == 0)
        if blocked:
            tob = lambda x: wavefront.to_blocks(x, rows, w, bh, bw)
            o, d, seeds_flat = tob(o), tob(d), tob(seeds_flat)

        take_gb = want_gbuffer and s == 0
        out = trace_paths(scene, accel, o, d, seeds_flat, config,
                          want_gbuffer=take_gb)
        rad = out[0] if take_gb else out
        if take_gb:
            gbuffer = out[1]
        if blocked:
            unb = lambda x: wavefront.from_blocks(x, rows, w, bh, bw)
            rad = unb(rad)
            if take_gb:
                gbuffer = {k: unb(v) for k, v in gbuffer.items()}
        acc = acc + rad
    img = (acc / jnp.float32(config.spp)).reshape(rows, w, 3)
    if want_gbuffer:
        gbuffer = {
            k: v.reshape((rows, w) + v.shape[1:])
            for k, v in gbuffer.items()
        }
        return img, gbuffer
    return img


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
