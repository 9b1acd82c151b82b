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


def test_temporal_shape_and_blend():
    """Temporal net: correct shape; with perfect history it can learn a
    high blend (smoke: output is finite and history-dependent)."""
    net, state, _ = upscaler.create_temporal()
    rs = np.random.RandomState(2)
    lr = jnp.asarray(rs.uniform(0, 1, (24, 32, 3)).astype(np.float32))
    hist = jnp.asarray(rs.uniform(0, 1, (48, 64, 4)).astype(np.float32))
    out = upscaler.upscale_temporal(net, state.params, lr, hist)
    assert out.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    out0 = upscaler.upscale_temporal(net, state.params, lr,
                                     jnp.zeros_like(hist))
    assert float(jnp.abs(out - out0).max()) > 0.0  # history is used


def test_temporal_train_step_reduces_loss():
    """With history == ground truth, the net should quickly learn to
    copy it (alpha -> 1), driving the loss down fast."""
    net, state, tx = upscaler.create_temporal(lr=3e-3)
    rs = np.random.RandomState(3)
    hr = jnp.asarray(rs.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))
    hist = jnp.concatenate([hr, jnp.ones(hr.shape[:-1] + (1,))], -1)
    lr_b = upscaler.downsample2(hr)
    noisy_lr = lr_b + 0.1 * jnp.asarray(
        rs.normal(0, 1, lr_b.shape).astype(np.float32))
    losses = []
    for i in range(30):
        state, loss = upscaler.train_step_temporal(state, net, tx,
                                                   noisy_lr, hist, hr)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]


def test_reproject_history_static_camera_identity():
    """A static camera must reproject history exactly onto itself
    (corner convention match with primary-ray generation)."""
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.renderer import camera_arrays

    h, w = 24, 32
    cfg = RenderConfig(width=w, height=h)
    cams = camera_arrays(Camera(position=(0.0, -1.0, -5.0)), cfg)
    o, d = primary_rays_p(cams.origin, cams.basis, cams.tan_half_fovy,
                          cams.aspect, w, h)
    # A wall of hits at t=3: world positions on the ray grid.
    t = 3.0
    wp = jnp.stack([(o.x + d.x * t).reshape(h, w),
                    (o.y + d.y * t).reshape(h, w),
                    (o.z + d.z * t).reshape(h, w)], axis=-1)
    hit = jnp.ones((h, w), jnp.float32)
    rs = np.random.RandomState(4)
    hist = jnp.asarray(rs.uniform(0, 1, (2 * h, 2 * w, 3))
                       .astype(np.float32))
    warped = upscaler.reproject_history(hist, wp, hit, cams, w, h)
    assert warped.shape == (2 * h, 2 * w, 4)
    assert float(warped[..., 3].min()) >= 0.0
    # Interior pixels must round-trip exactly (borders feel the resize).
    inner = np.asarray(warped)[8:-8, 8:-8, :3]
    ref = np.asarray(hist)[8:-8, 8:-8]
    np.testing.assert_allclose(inner, ref, rtol=2e-2, atol=2e-2)


def test_frameloop_temporal_upscale_smoke():
    """Two frames through FrameLoop in temporal mode: correct output
    size, finite, and history state advances."""
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.frameloop import FrameLoop
    from hrt_tpu.models.camera import Camera

    cfg = RenderConfig(width=32, height=24, max_depth=1, sky=True,
                       upscale=2, upscale_mode="temporal")
    loop = FrameLoop(bench.build_bench_scene(), cfg,
                     cull_threshold_px=0.0)
    cam = Camera(position=(0.0, -1.0, -6.0), rotation=(-0.15, 0.0, 0.0))
    img0 = np.asarray(loop.step(cam))
    assert img0.shape == (48, 64, 3)
    assert np.isfinite(img0).all()
    assert float(np.abs(np.asarray(loop.up_history)).max()) > 0.0
    img1 = np.asarray(loop.step(cam))
    assert np.isfinite(img1).all()


def test_fast_forward_spatial_matches_module():
    """The fused-head inference path (_forward_spatial) must equal
    UpscalerNet.__call__ — the head fold is an exact re-indexing."""
    net, state, _ = upscaler.create(features=8, depth=2)
    rs = np.random.RandomState(7)
    # Non-trivial params (init head is near-zero; randomize everything)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rs.normal(0, 0.5, p.shape)
                              .astype(np.float32)), state.params)
    img = jnp.asarray(rs.uniform(0, 2, (24, 40, 3)).astype(np.float32))
    ref = net.apply(params, img[None])[0]
    out = upscaler._forward_spatial(params, img, net.depth, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # bf16 trunk: same math at reduced precision
    out16 = upscaler._forward_spatial(params, img, net.depth,
                                      jnp.bfloat16)
    rel = float(jnp.abs(out16 - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel


def test_fast_forward_temporal_matches_module():
    """_forward_temporal (folded s2d first layer + fused head) must
    equal TemporalUpscalerNet.__call__."""
    net, state, _ = upscaler.create_temporal(features=8, depth=2)
    rs = np.random.RandomState(8)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rs.normal(0, 0.5, p.shape)
                              .astype(np.float32)), state.params)
    lr = jnp.asarray(rs.uniform(0, 2, (24, 40, 3)).astype(np.float32))
    hist = jnp.asarray(rs.uniform(0, 1, (48, 80, 4)).astype(np.float32))
    ref = net.apply(params, lr[None], hist[None])[0]
    out = upscaler._forward_temporal(params, lr, hist, net.depth,
                                     jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    out16 = upscaler._forward_temporal(params, lr, hist, net.depth,
                                       jnp.bfloat16)
    # Random N(0, .5) params drive the blend logits into sigmoid's
    # steep region, amplifying bf16 trunk noise ~7x vs the spatial net;
    # trained weights are far tamer (PSNR-gated in eval_temporal).
    rel = float(jnp.abs(out16 - ref).max() / jnp.abs(ref).max())
    assert rel < 0.1, rel
