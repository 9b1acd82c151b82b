"""Denoiser tests: variance reduction + temporal stability on synthetic
noise (SURVEY.md section 4, test plan item 5)."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.ops import denoise
from hrt_tpu.renderer import CameraArrays

H, W = 64, 64


def flat_gbuffer():
    """A flat wall facing the camera at depth 5."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    world = np.stack([xs / W * 2 - 1, ys / H * 2 - 1,
                      np.full((H, W), 5.0)], -1).astype(np.float32)
    return {
        "normal": jnp.asarray(np.tile([0.0, 0.0, -1.0], (H, W, 1)),
                              jnp.float32),
        "depth": jnp.full((H, W), 5.0, jnp.float32),
        "world_pos": jnp.asarray(world),
        "hit": jnp.ones((H, W), jnp.float32),
    }


def static_cam():
    return CameraArrays(
        origin=jnp.zeros(3, jnp.float32),
        basis=jnp.eye(3, dtype=jnp.float32),
        tan_half_fovy=jnp.float32(1.0),
        aspect=jnp.float32(1.0),
    )


def noisy_signal(seed, sigma=0.3):
    rs = np.random.RandomState(seed)
    clean = np.tile(np.array([0.5, 0.4, 0.3], np.float32), (H, W, 1))
    return clean, jnp.asarray(
        clean + rs.normal(0, sigma, (H, W, 3)).astype(np.float32))


def test_atrous_reduces_variance():
    clean, noisy = noisy_signal(0)
    gb = flat_gbuffer()
    var0 = jnp.full((H, W, 1), 0.09, jnp.float32)
    filtered, var = denoise.atrous_filter(noisy, var0, gb, levels=5)
    err_in = float(np.mean((np.asarray(noisy) - clean) ** 2))
    err_out = float(np.mean((np.asarray(filtered) - clean) ** 2))
    assert err_out < err_in * 0.1, (err_in, err_out)
    assert float(jnp.mean(var)) < 0.09


def test_atrous_preserves_edges():
    """A geometric edge (different normals/depths) must not blur across."""
    gb = flat_gbuffer()
    normal = np.asarray(gb["normal"]).copy()
    normal[:, W // 2:] = [-1.0, 0.0, 0.0]
    depth = np.asarray(gb["depth"]).copy()
    depth[:, W // 2:] = 9.0
    gb["normal"] = jnp.asarray(normal)
    gb["depth"] = jnp.asarray(depth)
    img = np.zeros((H, W, 3), np.float32)
    img[:, W // 2:] = 1.0
    var0 = jnp.full((H, W, 1), 0.01, jnp.float32)
    filtered, _ = denoise.atrous_filter(jnp.asarray(img), var0, gb,
                                        levels=5)
    f = np.asarray(filtered)
    assert f[:, : W // 2 - 2].max() < 0.05   # left stays dark
    assert f[:, W // 2 + 2:].min() > 0.95    # right stays bright


def test_temporal_accumulation_converges():
    """Static camera: accumulating noisy frames must approach the mean."""
    gb = flat_gbuffer()
    cam = static_cam()
    state = denoise.init_state(H, W)
    clean, _ = noisy_signal(0)
    out = None
    for f in range(16):
        _, noisy = noisy_signal(f)
        out, state = denoise.svgf(state, noisy, gb, cam, W, H, levels=2)
    err = float(np.mean((np.asarray(out) - clean) ** 2))
    _, one = noisy_signal(99)
    err_single = float(np.mean((np.asarray(one) - clean) ** 2))
    assert err < err_single * 0.05


def test_reprojection_invalidates_on_depth_change():
    gb = flat_gbuffer()
    cam = static_cam()
    state = denoise.init_state(H, W)
    clean, noisy = noisy_signal(1)
    _, _, state = denoise.temporal_accumulate(state, noisy, gb, cam, W, H)
    hist_before = float(jnp.mean(state.history))
    # Move geometry: depth jumps -> history rejected
    gb2 = dict(gb)
    gb2["depth"] = jnp.full((H, W), 50.0, jnp.float32)
    gb2["world_pos"] = gb["world_pos"] * jnp.asarray([1.0, 1.0, 10.0])
    _, _, state2 = denoise.temporal_accumulate(state, noisy, gb2, cam,
                                               W, H)
    assert float(jnp.mean(state2.history)) <= hist_before + 1e-5
    assert float(jnp.mean(state2.history)) < 1.5  # mostly reset


def test_svgf_passthrough_on_miss():
    """Sky pixels (hit=0) must pass through unfiltered."""
    gb = flat_gbuffer()
    gb["hit"] = jnp.zeros((H, W), jnp.float32)
    cam = static_cam()
    state = denoise.init_state(H, W)
    _, noisy = noisy_signal(2)
    out, _ = denoise.svgf(state, noisy, gb, cam, W, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(noisy),
                               atol=1e-5)
