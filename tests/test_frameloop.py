"""Full frame-loop pipeline: accumulate + denoise + upscale + resume."""
import os

import numpy as np
import jax.numpy as jnp

from hrt_tpu.config import RenderConfig
from hrt_tpu.frameloop import FrameLoop
from hrt_tpu.models.camera import Camera
from hrt_tpu.models.scene import reference_demo_scene

SMALL = dict(width=64, height=48, traversal="bvh")


def test_accumulation_reduces_noise():
    cfg = RenderConfig(max_depth=2, indirect=True, jitter=True,
                       accumulate=True, sky=True, **SMALL)
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)
    f0 = np.asarray(loop.step(Camera()))
    for _ in range(5):
        last = np.asarray(loop.step(Camera()))
    # Accumulated frames differ from frame 0 but stay finite/stable
    assert np.isfinite(last).all()
    assert loop.frame == 6


def test_denoise_pipeline_runs():
    cfg = RenderConfig(max_depth=1, sky=True, denoise=True, **SMALL)
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)
    img1 = loop.step(Camera())
    img2 = loop.step(Camera())
    assert img2.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(img2)).all()


def test_upscale_pipeline_shape():
    cfg = RenderConfig(max_depth=1, sky=True, upscale=2, **SMALL)
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)
    img = loop.step(Camera())
    assert img.shape == (96, 128, 3)


def test_checkpoint_roundtrip(tmp_path):
    cfg = RenderConfig(max_depth=1, sky=True, accumulate=True, **SMALL)
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)
    loop.step(Camera())
    loop.step(Camera())
    path = os.path.join(tmp_path, "state.npz")
    loop.save_state(path)

    loop2 = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)
    loop2.load_state(path)
    assert loop2.frame == 2
    np.testing.assert_allclose(np.asarray(loop2.accum),
                               np.asarray(loop.accum))
    a = np.asarray(loop.step(Camera()))
    b = np.asarray(loop2.step(Camera()))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_culling_in_loop():
    cfg = RenderConfig(max_depth=1, sky=True, **SMALL)
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=1.0)
    img = loop.step(Camera())
    assert np.isfinite(np.asarray(img)).all()


def test_runtime_resolution_switch():
    """Live resize mid-session (ref: RTApp.cpp:214-232 recreates the
    swapchain and keeps rendering): scene + BVH survive, size-dependent
    state rebuilds, temporal history restarts, and the denoise/upscale
    stages run at the new shape."""
    cfg = RenderConfig(max_depth=1, sky=True, denoise=True,
                       accumulate=True, **SMALL)
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)
    img = loop.step(Camera())
    assert img.shape == (48, 64, 3)
    accel_before = loop.accel
    loop.set_resolution(96, 64)
    assert loop.accel is accel_before          # BVH untouched
    assert loop.frame == 0                     # history restarted
    img = loop.step(Camera())
    assert img.shape == (64, 96, 3)
    assert np.isfinite(np.asarray(img)).all()
    # No-op resize keeps state.
    loop.set_resolution(96, 64)
    assert loop.frame == 1
    # And back down again, with the upscaler history following.
    cfg2 = RenderConfig(max_depth=1, sky=True, upscale=2, **SMALL)
    loop2 = FrameLoop(reference_demo_scene(), cfg2, cull_threshold_px=0)
    assert loop2.step(Camera()).shape == (96, 128, 3)
    loop2.set_resolution(32, 24)
    assert loop2.step(Camera()).shape == (48, 64, 3)
