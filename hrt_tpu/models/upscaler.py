"""Learned 2x upscaler — the DLSS-Super-Resolution stand-in.

The reference only advertises DLSS in window titles (ref: RTApp.cpp:3,
App.cpp:31) with comment markers where it would run (RTApp.cpp:162-163);
there is no implementation.  This is a real one: a small residual CNN
on top of bilinear upsampling, jitted into the frame program (conv =
MXU work, exactly what the TPU wants).  Trained self-supervised on
rendered frames: downsample a rendered frame 2x, learn to reconstruct
the original (models fit in a few thousand steps).

Also doubles as the framework's "training loop" exemplar: `train_step`
is a full optax/flax update compatible with data-parallel sharding
(see parallel/tiles.py and __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class UpscalerNet(nn.Module):
    """Residual conv net predicting the bilinear-upsample residual."""

    features: int = 32
    depth: int = 3

    @nn.compact
    def __call__(self, lr):
        """lr: (..., H, W, 3) linear radiance -> (..., 2H, 2W, 3)."""
        h, w = lr.shape[-3], lr.shape[-2]
        up = jax.image.resize(
            lr, lr.shape[:-3] + (2 * h, 2 * w, 3), method="bilinear")
        x = lr
        for _ in range(self.depth):
            x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
        # Pixel-shuffle head: predict 2x2x3 residual per LR pixel.
        x = nn.Conv(12, (3, 3), padding="SAME")(x)
        x = x.reshape(x.shape[:-3] + (h, w, 2, 2, 3))
        x = jnp.swapaxes(x, -4, -3)  # (..., h, 2, w, 2, 3)
        residual = x.reshape(x.shape[:-5] + (2 * h, 2 * w, 3))
        return up + residual


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create(rng_key=None, features: int = 32, depth: int = 3,
           lr: float = 1e-3):
    """Returns (net, state, optimizer)."""
    net = UpscalerNet(features=features, depth=depth)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    params = net.init(rng_key, jnp.zeros((1, 32, 32, 3), jnp.float32))
    tx = optax.adam(lr)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    return net, state, tx


def _loss_fn(params, net, lr_batch, hr_batch):
    pred = net.apply(params, lr_batch)
    # Charbonnier on tonemapped values: perceptually saner than L2 on HDR.
    tm = lambda x: x / (1.0 + jnp.abs(x))
    diff = tm(pred) - tm(hr_batch)
    return jnp.mean(jnp.sqrt(diff * diff + 1e-6))


@functools.partial(jax.jit, static_argnames=("net", "tx"))
def train_step(state: TrainState, net: UpscalerNet, tx, lr_batch,
               hr_batch):
    """One optimizer update. Batches: (B, h, w, 3) and (B, 2h, 2w, 3)."""
    loss, grads = jax.value_and_grad(_loss_fn)(state.params, net,
                                               lr_batch, hr_batch)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x box downsample (the self-supervision pairing)."""
    h, w = img.shape[-3], img.shape[-2]
    x = img.reshape(img.shape[:-3] + (h // 2, 2, w // 2, 2, 3))
    return x.mean(axis=(-4, -2))


def self_supervised_batch(frames: jnp.ndarray, key, crop: int = 64,
                          batch: int = 8):
    """Random HR crops + their downsamples from a stack of rendered
    frames (F, H, W, 3)."""
    f, h, w, _ = frames.shape
    kf, ky, kx = jax.random.split(key, 3)
    fi = jax.random.randint(kf, (batch,), 0, f)
    ys = jax.random.randint(ky, (batch,), 0, h - crop + 1)
    xs = jax.random.randint(kx, (batch,), 0, w - crop + 1)

    def take(args):
        i, y, x = args
        return jax.lax.dynamic_slice(frames[i], (y, x, 0), (crop, crop, 3))

    hr = jax.vmap(take)((fi, ys, xs))
    return downsample2(hr), hr


def upscale(net: UpscalerNet, params, img: jnp.ndarray) -> jnp.ndarray:
    """Apply the upscaler to one (H, W, 3) frame (fused-head fast
    inference path; equivalent to net.apply — test_upscaler checks)."""
    return _forward_spatial(params, img, net.depth, _infer_dtype())


# ---------------------------------------------------------------------------
# Temporal ("ray reconstruction") mode: current LR frame + reprojected
# HR history.  The reference advertises DLSS Ray Reconstruction with no
# implementation (ref: README.md; marker comments RTApp.cpp:162-163);
# this is a real temporal reconstruction net: a learned per-pixel blend
# between the spatially-upscaled current frame and the warped previous
# output, so static regions converge to accumulated history while
# disocclusions fall back to the spatial path.
# ---------------------------------------------------------------------------

def space_to_depth2(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 2h, 2w, c) -> (..., h, w, 4c)."""
    h2, w2, c = img.shape[-3], img.shape[-2], img.shape[-1]
    x = img.reshape(img.shape[:-3] + (h2 // 2, 2, w2 // 2, 2, c))
    x = jnp.swapaxes(x, -4, -3)  # (..., h, w, 2, 2, c)
    return x.reshape(x.shape[:-3] + (4 * c,))


class TemporalUpscalerNet(nn.Module):
    """2x reconstruction from (current LR, reprojected HR history).

    Head predicts a 2x2 pixel-shuffled residual over the bilinear
    upsample plus a sigmoid blend alpha toward the history.  The
    history carries an explicit VALIDITY channel (reprojection in
    bounds AND surface hit) so the net can tell "black because
    disoccluded" from "black because dark"."""

    features: int = 32
    depth: int = 3

    @nn.compact
    def __call__(self, lr, hist):
        """lr: (..., h, w, 3); hist: (..., 2h, 2w, 4) rgb+validity
        -> (..., 2h, 2w, 3)."""
        h, w = lr.shape[-3], lr.shape[-2]
        up = jax.image.resize(
            lr, lr.shape[:-3] + (2 * h, 2 * w, 3), method="bilinear")
        x = jnp.concatenate([lr, space_to_depth2(hist)], axis=-1)
        for _ in range(self.depth):
            x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
        head = nn.Conv(16, (3, 3), padding="SAME")(x)

        def shuffle(t, c):
            t = t.reshape(t.shape[:-3] + (h, w, 2, 2, c))
            t = jnp.swapaxes(t, -4, -3)
            return t.reshape(t.shape[:-5] + (2 * h, 2 * w, c))

        residual = shuffle(head[..., :12], 3)
        alpha = nn.sigmoid(shuffle(head[..., 12:16], 1))
        spatial = up + residual
        hist_rgb = hist[..., :3]
        valid = hist[..., 3:4]
        return spatial + alpha * valid * (hist_rgb - spatial)


def create_temporal(rng_key=None, features: int = 32, depth: int = 3,
                    lr: float = 1e-3):
    """Returns (net, state, optimizer) for the temporal mode."""
    net = TemporalUpscalerNet(features=features, depth=depth)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    params = net.init(rng_key, jnp.zeros((1, 32, 32, 3), jnp.float32),
                      jnp.zeros((1, 64, 64, 4), jnp.float32))
    tx = optax.adam(lr)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    return net, state, tx


def _loss_fn_temporal(params, net, lr_batch, hist_batch, hr_batch):
    pred = net.apply(params, lr_batch, hist_batch)
    tm = lambda x: x / (1.0 + jnp.abs(x))
    diff = tm(pred) - tm(hr_batch)
    return jnp.mean(jnp.sqrt(diff * diff + 1e-6))


@functools.partial(jax.jit, static_argnames=("net", "tx"))
def train_step_temporal(state: TrainState, net, tx, lr_batch,
                        hist_batch, hr_batch):
    loss, grads = jax.value_and_grad(_loss_fn_temporal)(
        state.params, net, lr_batch, hist_batch, hr_batch)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def _upsample2_corner(img: jnp.ndarray) -> jnp.ndarray:
    """Exact corner-convention 2x bilinear upsample of (H, W, C):
    out[2i, 2j] = img[i, j], odd coordinates average their neighbors
    (edge-clamped) — the closed form of _bilinear at the half-integer
    grid, with zero gathers."""
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    row0 = img
    row1 = (img + right) * 0.5
    wide = jnp.stack([row0, row1], axis=2).reshape(
        img.shape[0], 2 * img.shape[1], img.shape[2])
    down = jnp.concatenate([wide[1:], wide[-1:]], axis=0)
    out = jnp.stack([wide, (wide + down) * 0.5], axis=1)
    return out.reshape(2 * img.shape[0], 2 * img.shape[1],
                       img.shape[2])


def reproject_history(hist: jnp.ndarray, world_pos, hit_mask, prev_cam,
                      width: int, height: int,
                      pallas_warp: bool = True) -> jnp.ndarray:
    """Warp the previous HR output onto the current frame.

    world_pos/hit_mask: current-frame G-buffer at RENDER res (H, W, *)
    — resized to the HR grid (surfaces are locally smooth, so bilinear
    motion is accurate away from silhouettes; the net's alpha channel
    handles the rest).  Returns (2H, 2W, 4): warped rgb + a validity
    channel (0 where out of bounds / miss — lets the net distinguish
    disocclusion from darkness)."""
    from ..ops.denoise import _bilinear, _project

    h2, w2 = hist.shape[0], hist.shape[1]
    # Corner-convention 2x upsample: LR sample (i, j) sits exactly at
    # HR coordinate (2i, 2j) under the launchID pixel convention
    # (clip = id/size*2-1, ref: raytracing.slang:100) — jax.image.resize
    # uses half-pixel centers and would shift motion by ~0.5 HR px.
    # The sample grid is exactly half-integer, so the bilinear fetch is
    # a SEPARABLE neighbor average — pure shifts/interleaves instead of
    # 4 gathers of an (2H*2W, 3) table (measured ~70 ms at 4K).
    wp = _upsample2_corner(world_pos)
    hm = jnp.repeat(jnp.repeat(hit_mask, 2, axis=0), 2, axis=1)
    px, py, _ = _project(wp, prev_cam.origin, prev_cam.basis,
                         prev_cam.tan_half_fovy, prev_cam.aspect,
                         w2, h2)
    from ..ops import warp_pallas

    if pallas_warp and warp_pallas.enabled():
        # Bounded-motion Pallas warp (TPU): bit-exact at valid pixels,
        # 4.7x faster than the gather path at 4K; out-of-margin pixels
        # come back invalid = disocclusion, exactly what the net's
        # validity channel is trained for.
        val, inb = warp_pallas.warp_bilinear(hist, px, py)
    else:
        val, inb = _bilinear(hist, px, py)
    ok = (inb & (hm > 0.5))[..., None]
    return jnp.concatenate(
        [jnp.where(ok, val, 0.0), ok.astype(jnp.float32)], axis=-1)


def upscale_temporal(net, params, img: jnp.ndarray,
                     hist: jnp.ndarray) -> jnp.ndarray:
    """Apply the temporal upscaler to one (H, W, 3) frame with a
    reprojected (2H, 2W, 4) rgb+validity history (fused-head fast
    inference path; equivalent to net.apply — test_upscaler checks)."""
    return _forward_temporal(params, img, hist, net.depth,
                             _infer_dtype())


# ---------------------------------------------------------------------------
# Fast inference forward.
#
# The flax modules above are the trainable definition; inference in the
# frame program uses this algebraically-equivalent re-expression that
# avoids every layout-changing op XLA materializes as a copy:
#
#  * The pixel-shuffle head's reshape -> swapaxes -> reshape (a 5-d
#    transpose XLA materializes as 25 ms of copies at 4K) becomes a
#    kernel-side channel permutation (each output parity's channels
#    made contiguous) + the two-stage stack/reshape interleave of
#    _upsample2_corner — minor-axis interleaves XLA emits as cheap
#    fusions (~1.6 ms per 4K plane).  (An lhs-dilated 6x6 conv is
#    algebraically the same fold but lowers to an 82 ms T(1,128)
#    monster on TPU — measured, do not go back.)
#  * space_to_depth2(hist) + first 3x3 conv over the packed channels is
#    a 6x6 stride-2 convolution on the raw HR history (same index fold).
#  * The trunk optionally runs in bf16 with f32 accumulation
#    (HRT_UP_BF16=0 forces f32): convs are MXU work, bf16 halves the
#    multiply passes; the residual-over-bilinear output keeps f32.
#
# The per-(r,s) head bias becomes a (2,2,n)-periodic plane added after.
# ---------------------------------------------------------------------------

import os as _os

import numpy as _np


def _infer_dtype():
    return (jnp.bfloat16 if _os.environ.get("HRT_UP_BF16", "1") == "1"
            else jnp.float32)


def _conv(x, k, dtype, stride=(1, 1), padding="SAME", lhs_dilation=None):
    """NHWC conv of one (H, W, C) image; f32 accumulate/output."""
    y = jax.lax.conv_general_dilated(
        x[None].astype(dtype), k.astype(dtype), window_strides=stride,
        padding=padding, lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y[0]


def _head_perm(n_res: int, alpha: bool):
    """Channel permutation making each output parity (r, s) contiguous:
    new channel 4*(r*2+s)+n <- module channel m(r,s,n).  Module packing
    (the reshape to (h, w, 2, 2, n)): m = (r*2+s)*n_res + n, alpha at
    4*n_res + (r*2+s)."""
    perm = []
    for k in range(4):
        perm += [k * n_res + n for n in range(n_res)]
        if alpha:
            perm.append(4 * n_res + k)
    return _np.asarray(perm, _np.int32)


def _interleave2(parts, h: int, w: int):
    """parts[(r, s)] of (h, w, c) -> (2h, 2w, c) with
    out[2i+r, 2j+s] = parts[(r, s)][i, j] — two stack/reshape
    minor-axis interleaves (cheap fusions; a 5-d transpose is not)."""
    c = parts[(0, 0)].shape[-1]
    wide = [jnp.stack([parts[(r, 0)], parts[(r, 1)]],
                      axis=2).reshape(h, 2 * w, c) for r in (0, 1)]
    return jnp.stack(wide, axis=1).reshape(2 * h, 2 * w, c)


def _head_hr(x, kernel, bias, n_res: int, alpha: bool, dtype):
    """Apply the shuffle head: (h, w, F) -> (2h, 2w, n_out)."""
    n_out = n_res + (1 if alpha else 0)
    perm = _head_perm(n_res, alpha)
    head = _conv(x, kernel[..., perm], dtype) + bias[perm]
    h, w = x.shape[0], x.shape[1]
    parts = {(r, s): head[..., (r * 2 + s) * n_out:
                          (r * 2 + s + 1) * n_out]
             for r in (0, 1) for s in (0, 1)}
    return _interleave2(parts, h, w)


@functools.lru_cache(maxsize=None)
def _first_index_tables(c_hist: int):
    pos = _np.zeros((6, 6), _np.int32)
    CH = _np.zeros((6, 6, c_hist), _np.int32)
    for u in range(6):
        di, r = u // 2, u % 2
        for v in range(6):
            dj, s = v // 2, v % 2
            pos[u, v] = di * 3 + dj
            for c in range(c_hist):
                CH[u, v, c] = (r * 2 + s) * c_hist + c
    return pos, CH


def _fold_first(kernel, c_lr: int, c_hist: int):
    """Split the first trunk kernel (3,3,c_lr+4*c_hist,F) into the LR
    part (3,3,c_lr,F) and a 6x6 stride-2 kernel over the raw HR history
    (undoing space_to_depth2: HR tap (2(i+di-1)+r, 2(j+dj-1)+s) sits at
    kernel position (2*di+r, 2*dj+s) with padding (2,2))."""
    pos, CH = _first_index_tables(c_hist)
    k_lr = kernel[:, :, :c_lr, :]
    f = kernel.shape[3]
    kh9 = kernel[:, :, c_lr:, :].reshape(9, 4 * c_hist, f)
    k_h6 = jnp.take_along_axis(kh9[pos], jnp.asarray(CH)[:, :, :, None],
                               axis=2)                 # (6,6,c_hist,F)
    return k_lr, k_h6


def _upsample_bilinear2(img):
    h, w = img.shape[0], img.shape[1]
    return jax.image.resize(img, (2 * h, 2 * w, img.shape[2]),
                            method="bilinear")


def _forward_spatial(params, img, depth: int, dtype):
    """== UpscalerNet.__call__ on one (H, W, 3) frame."""
    p = params["params"]
    up = _upsample_bilinear2(img)
    x = img
    for i in range(depth):
        x = nn.relu(_conv(x, p[f"Conv_{i}"]["kernel"], dtype)
                    + p[f"Conv_{i}"]["bias"])
    head = p[f"Conv_{depth}"]
    res = _head_hr(x, head["kernel"], head["bias"], 3, False, dtype)
    return up + res


def _forward_temporal(params, lr, hist, depth: int, dtype):
    """== TemporalUpscalerNet.__call__ on one (H, W, 3) frame with its
    (2H, 2W, 4) rgb+validity history."""
    p = params["params"]
    up = _upsample_bilinear2(lr)
    k_lr, k_h6 = _fold_first(p["Conv_0"]["kernel"], lr.shape[-1], 4)
    x = nn.relu(_conv(lr, k_lr, dtype)
                + _conv(hist, k_h6, dtype, stride=(2, 2),
                        padding=((2, 2), (2, 2)))
                + p["Conv_0"]["bias"])
    for i in range(1, depth):
        x = nn.relu(_conv(x, p[f"Conv_{i}"]["kernel"], dtype)
                    + p[f"Conv_{i}"]["bias"])
    head = p[f"Conv_{depth}"]
    o = _head_hr(x, head["kernel"], head["bias"], 3, True, dtype)
    residual, alpha = o[..., :3], nn.sigmoid(o[..., 3:4])
    spatial = up + residual
    hist_rgb, valid = hist[..., :3], hist[..., 3:4]
    return spatial + alpha * valid * (hist_rgb - spatial)
