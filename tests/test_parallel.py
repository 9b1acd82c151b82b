"""Tile-parallel rendering on the 8-device virtual CPU mesh: the sharded
frame must equal the single-device frame exactly."""
import numpy as np
import jax
import jax.numpy as jnp

from hrt_tpu.config import RenderConfig
from hrt_tpu.models.camera import Camera
from hrt_tpu.models.scene import reference_demo_scene
from hrt_tpu.parallel import tiles
from hrt_tpu.renderer import camera_arrays, render_frame


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_tiled_matches_single_device():
    cfg = RenderConfig(width=64, height=48, max_depth=1, sky=True)
    scene = reference_demo_scene().build()
    cams = camera_arrays(Camera(), cfg)
    frame = jnp.uint32(0)

    ref = np.asarray(render_frame(scene, None, cams, frame, cfg))

    mesh = tiles.make_mesh(8)
    scene_r = tiles.replicate(scene, mesh)
    got = np.asarray(
        tiles.render_frame_tiled(scene_r, None, cams, frame, cfg, mesh))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_full_pipeline_tiled_matches_single_device():
    """The FULL frame program (trace -> shade -> accumulate -> denoise
    -> temporal 2x upscale) under the 8-device mesh must match the
    single-device program (VERDICT round-2 item 5: multi-chip as a
    first-class render mode, not trace-only)."""
    from hrt_tpu.frameloop import FrameLoop

    cfg = RenderConfig(width=64, height=48, max_depth=1, sky=True,
                       denoise=True, accumulate=True, upscale=2,
                       upscale_mode="temporal")
    cam = Camera()

    def run(mesh):
        loop = FrameLoop(reference_demo_scene(), cfg,
                         cull_threshold_px=0.0, mesh=mesh)
        return [np.asarray(loop.step(cam)) for _ in range(2)]

    ref = run(None)
    got = run(tiles.make_mesh(8))
    for r, g in zip(ref, got):
        assert g.shape == (96, 128, 3)
        np.testing.assert_allclose(g, r, atol=2e-5)


def test_tiled_rejects_bad_height():
    cfg = RenderConfig(width=64, height=50, max_depth=1)
    scene = reference_demo_scene().build()
    cams = camera_arrays(Camera(), cfg)
    mesh = tiles.make_mesh(8)
    import pytest

    with pytest.raises(ValueError):
        tiles.render_frame_tiled(scene, None, cams, jnp.uint32(0), cfg, mesh)
