"""Upscaler: shape correctness + the training step actually learns."""
import numpy as np
import jax
import jax.numpy as jnp

from hrt_tpu.models import upscaler


def test_upscale_shape_and_identity_start():
    net, state, _ = upscaler.create()
    img = jnp.asarray(np.random.RandomState(0)
                      .uniform(0, 1, (48, 64, 3)).astype(np.float32))
    out = upscaler.upscale(net, state.params, img)
    assert out.shape == (96, 128, 3)
    # Fresh net ~ bilinear upsample (residual head is small at init)
    bil = jax.image.resize(img, (96, 128, 3), "bilinear")
    assert float(jnp.abs(out - bil).mean()) < 0.5


def test_downsample2():
    x = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3)
    d = upscaler.downsample2(x)
    assert d.shape == (2, 2, 3)
    np.testing.assert_allclose(
        np.asarray(d[0, 0]), np.asarray((x[0, 0] + x[0, 1] + x[1, 0]
                                         + x[1, 1]) / 4))


def test_train_step_reduces_loss():
    net, state, tx = upscaler.create(lr=3e-3)
    rs = np.random.RandomState(1)
    # Learnable structure: smooth gradients + edges
    frames = np.zeros((2, 64, 64, 3), np.float32)
    ys, xs = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    frames[0, ..., 0] = xs / 64.0
    frames[0, ..., 1] = ys / 64.0
    frames[1, ..., 2] = ((xs // 8 + ys // 8) % 2).astype(np.float32)
    frames = jnp.asarray(frames + rs.normal(0, 0.01, frames.shape)
                         .astype(np.float32))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        lr_b, hr_b = upscaler.self_supervised_batch(frames, sub,
                                                    crop=32, batch=4)
        state, loss = upscaler.train_step(state, net, tx, lr_b, hr_b)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
