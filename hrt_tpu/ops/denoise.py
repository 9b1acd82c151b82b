"""SVGF-style temporal denoiser.

The reference ships an empty Denoiser stub whose comment block names
the plan: temporal accumulation with reprojection, history clamping,
variance estimation, a-trous wavelet filtering, bilateral pass
(ref: Graphics/Denoiser/Denoiser.h:5-12).  This implements exactly that
plan in JAX, fused into the frame program:

  1. reproject each pixel's world position into the previous camera,
     bilinearly fetch color/moments history, validate by depth+normal;
  2. history clamp: clamp history to the 3x3 neighborhood color AABB of
     the current frame (kills ghosting);
  3. temporal accumulation of color and luminance moments -> variance;
  4. spatial variance bootstrap for short histories;
  5. 5-level edge-aware a-trous wavelet filter (edge-stopping on
     luminance/depth/normal; the "bilateral pass" is level 0).

All convolution work is expressed as shifted adds on (H, W, C) arrays
(XLA fuses the 3x3/5x5 stencils into single VPU loops); state is an
explicit pytree so checkpoint/resume is trivial (SURVEY.md section 5).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.math3d import luminance


class DenoiseState(NamedTuple):
    """Temporal history carried between frames."""

    color: jnp.ndarray     # (H, W, 3) accumulated illumination
    moments: jnp.ndarray   # (H, W, 2) first/second luminance moments
    history: jnp.ndarray   # (H, W, 1) frames accumulated per pixel
    depth: jnp.ndarray     # (H, W, 1)
    normal: jnp.ndarray    # (H, W, 3)


def init_state(h: int, w: int) -> DenoiseState:
    return DenoiseState(
        color=jnp.zeros((h, w, 3), jnp.float32),
        moments=jnp.zeros((h, w, 2), jnp.float32),
        history=jnp.zeros((h, w, 1), jnp.float32),
        depth=jnp.zeros((h, w, 1), jnp.float32),
        normal=jnp.zeros((h, w, 3), jnp.float32),
    )


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped spatial shift (the stencil primitive)."""
    h, w = x.shape[0], x.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return x[ys][:, xs]


def _project(world_pos, cam_origin, cam_basis, tan_half_fovy, aspect,
             width, height):
    """World -> previous-frame pixel coordinates (inverse of
    models/camera.primary_rays algebra)."""
    rel = world_pos - cam_origin
    # camera-space = basis @ rel (basis rows u, v, w)
    x = jnp.sum(rel * cam_basis[0], -1)
    y = jnp.sum(rel * cam_basis[1], -1)
    z = jnp.sum(rel * cam_basis[2], -1)
    z = jnp.maximum(z, 1e-6)
    cx = x / (z * aspect * tan_half_fovy)
    cy = y / (z * tan_half_fovy)
    px = (cx + 1.0) * 0.5 * width
    py = (cy + 1.0) * 0.5 * height
    return px, py, z


def _bilinear(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Bilinear fetch of (H, W, C) at float coords; returns
    (value, in_bounds mask).

    Corner convention: pixel (i, j)'s sample sits at coordinate (i, j)
    — matching primary-ray generation (clip = launchID/size*2-1, ref:
    raytracing.slang:100), so a static camera reprojects exactly onto
    itself (no half-pixel history blur).

    Cost model (ROADMAP): TPU HBM gathers are latency-bound PER ROW
    (~20-25 ns) regardless of row width, so the 2x2 neighborhood is
    pre-packed into one (H*W, 4C) table with edge-clamped shifts
    (vector work, ~free) and each output pixel pays ONE row gather
    instead of four.  In-bounds results are bit-identical to four
    individually-clamped taps (the shifts clamp the same way); out of
    bounds the corner taps differ, but every caller masks by `inb`.
    Measured 4 taps x ~64 ms -> 1 x ~64 ms at 1080p->4K."""
    h, w = img.shape[0], img.shape[1]
    c = img.shape[2]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    inb = (px >= 0.0) & (px <= w - 1.0) & (py >= 0.0) & (py <= h - 1.0)
    # Single-axis row gather of the flattened image: the two-axis form
    # img[yy, xx] lowers to a 2-D-start-index gather that runs ~100x
    # slower on TPU (measured 21 ms vs sub-ms per 1080p tap).
    right = _shift(img, 0, 1)
    down = _shift(img, 1, 0)
    diag = _shift(down, 0, 1)
    packed = jnp.concatenate([img, right, down, diag],
                             axis=-1).reshape(h * w, 4 * c)
    idx = (jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1))
    row = packed[idx]
    wgt = lambda g: g[..., None]
    val = (row[..., 0:c] * wgt((1 - fx) * (1 - fy))
           + row[..., c:2 * c] * wgt(fx * (1 - fy))
           + row[..., 2 * c:3 * c] * wgt((1 - fx) * fy)
           + row[..., 3 * c:4 * c] * wgt(fx * fy))
    return val, inb


def temporal_accumulate(state: DenoiseState, color, gbuffer, prev_cam,
                        width: int, height: int,
                        alpha: float = 0.2, alpha_moments: float = 0.2,
                        pallas_warp: bool = True):
    """Reproject + clamp + accumulate.  Returns (illum, variance,
    new_state-without-spatial-filter-color).

    pallas_warp: allow the bounded-motion Pallas warp
    (ops/warp_pallas, TPU only) for the history fetch — 4.5x faster
    than the gather path; out-of-margin pixels (strong parallax at
    silhouettes) come back invalid, which this function already treats
    as a disocclusion.  Pass False under GSPMD sharding
    (parallel/tiles runs the post stages on row-sharded globals, where
    a pallas_call cannot be partitioned)."""
    normal = gbuffer["normal"]
    depth = gbuffer["depth"][..., None]
    world_pos = gbuffer["world_pos"]
    hit = gbuffer["hit"][..., None]

    px, py, _ = _project(world_pos, prev_cam.origin, prev_cam.basis,
                         prev_cam.tan_half_fovy, prev_cam.aspect,
                         width, height)
    # ONE bilinear fetch of all history channels packed (H, W, 10):
    # per-channel fetches cost 4 gathers EACH and measured ~21 ms per
    # single-channel gather at 1080p (TPU gathers are row-granular —
    # wider rows amortize; 20 gathers -> 4).
    packed = jnp.concatenate([state.color, state.moments,
                              state.history, state.depth,
                              state.normal], axis=-1)
    from .warp_pallas import enabled as _pallas_warp_enabled
    if pallas_warp and _pallas_warp_enabled():
        from .warp_pallas import warp_bilinear

        hist_all, inb = warp_bilinear(packed, px, py)
    else:
        hist_all, inb = _bilinear(packed, px, py)
    hist_color = hist_all[..., 0:3]
    hist_moments = hist_all[..., 3:5]
    hist_len = hist_all[..., 5:6]
    hist_depth = hist_all[..., 6:7]
    hist_normal = hist_all[..., 7:10]

    # Validity: reprojection in bounds, surface hit, consistent geometry.
    ndot = jnp.sum(normal * hist_normal, -1, keepdims=True)
    zdiff = jnp.abs(hist_depth - depth) / jnp.maximum(depth, 1e-3)
    valid = (inb[..., None] & (hit > 0.5) & (ndot > 0.7)
             & (zdiff < 0.1)).astype(jnp.float32)

    # History clamp: neighborhood color AABB of the current frame.
    cmin = color
    cmax = color
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift(color, dy, dx)
            cmin = jnp.minimum(cmin, s)
            cmax = jnp.maximum(cmax, s)
    hist_color = jnp.clip(hist_color, cmin, cmax)

    hist_len = (hist_len + 1.0) * valid + (1.0 - valid)
    a_c = jnp.maximum(alpha, 1.0 / hist_len)
    a_m = jnp.maximum(alpha_moments, 1.0 / hist_len)

    illum = hist_color + (color - hist_color) * a_c
    lum = luminance(color)[..., None]
    cur_moments = jnp.concatenate([lum, lum * lum], axis=-1)
    moments = hist_moments + (cur_moments - hist_moments) * a_m
    variance = jnp.maximum(moments[..., 1:2] - moments[..., 0:1] ** 2, 0.0)

    # Spatial variance bootstrap while history is short (< 4 frames).
    lum_sum = jnp.zeros_like(lum)
    lum2_sum = jnp.zeros_like(lum)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift(lum, dy, dx)
            lum_sum = lum_sum + s
            lum2_sum = lum2_sum + s * s
    mean = lum_sum / 9.0
    spatial_var = jnp.maximum(lum2_sum / 9.0 - mean * mean, 0.0)
    variance = jnp.where(hist_len < 4.0, jnp.maximum(variance, spatial_var),
                         variance)

    new_state = DenoiseState(color=illum, moments=moments,
                             history=hist_len, depth=depth, normal=normal)
    return illum, variance, new_state


def atrous_filter(illum, variance, gbuffer, levels: int = 5,
                  sigma_l: float = 4.0, sigma_z: float = 1.0,
                  sigma_n: float = 128.0):
    """Edge-aware a-trous wavelet filter (5 levels, 3x3 B1 kernel with
    exponentially growing stride).  Filters variance alongside color."""
    normal = gbuffer["normal"]
    depth = gbuffer["depth"][..., None]
    hit = gbuffer["hit"][..., None]
    kernel = [1.0, 2.0 / 3.0, 1.0 / 6.0]  # distance-indexed weight

    for level in range(levels):
        stride = 1 << level
        lum_p = luminance(illum)[..., None]
        var_p = variance
        # Variance prefilter (3x3) steadies the luminance sigma.
        vsum = jnp.zeros_like(var_p)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                vsum = vsum + _shift(var_p, dy, dx)
        sigma_lum = sigma_l * jnp.sqrt(jnp.maximum(vsum / 9.0, 1e-10))

        acc_c = illum * kernel[0] ** 2
        acc_v = variance * (kernel[0] ** 2) ** 2
        acc_w = jnp.full_like(lum_p, kernel[0] ** 2)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                h = kernel[abs(dy)] * kernel[abs(dx)]
                q_c = _shift(illum, dy * stride, dx * stride)
                q_v = _shift(variance, dy * stride, dx * stride)
                q_l = _shift(lum_p, dy * stride, dx * stride)
                q_z = _shift(depth, dy * stride, dx * stride)
                q_n = _shift(normal, dy * stride, dx * stride)
                q_hit = _shift(hit, dy * stride, dx * stride)

                w_l = jnp.exp(-jnp.abs(q_l - lum_p)
                              / jnp.maximum(sigma_lum, 1e-10))
                w_z = jnp.exp(-jnp.abs(q_z - depth)
                              / (sigma_z * stride
                                 * jnp.maximum(depth, 1e-3)))
                w_n = jnp.maximum(
                    jnp.sum(q_n * normal, -1, keepdims=True), 0.0
                ) ** sigma_n
                w = h * w_l * w_z * w_n * q_hit
                acc_c = acc_c + q_c * w
                acc_v = acc_v + q_v * w * w
                acc_w = acc_w + w
        illum = acc_c / jnp.maximum(acc_w, 1e-10)
        variance = acc_v / jnp.maximum(acc_w, 1e-10) ** 2
    return illum, variance


def svgf(state: DenoiseState, color, gbuffer, prev_cam, width: int,
         height: int, levels: int = 5, pallas_warp: bool = True):
    """Full SVGF step.  Returns (denoised (H,W,3), new state).

    The new state's color history is the level-1 filtered illumination
    (standard SVGF feedback choice: stabler than raw, sharper than the
    fully filtered output)."""
    illum, variance, st = temporal_accumulate(state, color, gbuffer,
                                              prev_cam, width, height,
                                              pallas_warp=pallas_warp)
    if levels == 0:
        return illum, st
    # One feedback level:
    fb, fb_var = atrous_filter(illum, variance, gbuffer, levels=1)
    out, _ = atrous_filter(fb, fb_var, gbuffer, levels=levels - 1)
    st = st._replace(color=fb)
    hit = gbuffer["hit"][..., None]
    out = out * hit + color * (1.0 - hit)  # keep sky/background crisp
    return out, st
