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
    """Apply the upscaler to one (H, W, 3) frame."""
    return net.apply(params, img[None])[0]


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
    reprojected (2H, 2W, 4) rgb+validity history."""
    return net.apply(params, img[None], hist[None])[0]
