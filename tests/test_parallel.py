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


def test_tiled_rejects_bad_height():
    cfg = RenderConfig(width=64, height=50, max_depth=1)
    scene = reference_demo_scene().build()
    cams = camera_arrays(Camera(), cfg)
    mesh = tiles.make_mesh(8)
    import pytest

    with pytest.raises(ValueError):
        tiles.render_frame_tiled(scene, None, cams, jnp.uint32(0), cfg, mesh)
