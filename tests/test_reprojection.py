"""Denoiser reprojection is the exact inverse of primary-ray generation,
and moving-camera history tracks geometry."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models.camera import Camera, primary_rays
from hrt_tpu.ops import denoise
from hrt_tpu.renderer import CameraArrays

W, H = 64, 48


def cam_arrays(cam):
    return CameraArrays(*cam.ray_params(W, H))


def test_project_inverts_raygen():
    cam = Camera(position=(0.3, -0.5, -2.0), rotation=(0.2, 0.4, 0.1),
                 fov_y=1.0)
    origin, basis, tan_half, aspect = cam.ray_params(W, H)
    o, d = primary_rays(origin, basis, tan_half, aspect, W, H)
    rs = np.random.RandomState(0)
    depth = jnp.asarray(rs.uniform(1, 5, (H, W, 1)).astype(np.float32))
    world = o + depth * d
    px, py, _ = denoise._project(world, origin, basis, tan_half, aspect,
                                 W, H)
    np.testing.assert_allclose(np.asarray(px),
                               np.broadcast_to(np.arange(W)[None, :], (H, W)),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(py),
                               np.broadcast_to(np.arange(H)[:, None], (H, W)),
                               rtol=0, atol=1e-3)


def test_static_camera_bilinear_identity():
    """Static camera: history fetch must be the identity (no blur)."""
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(H, W, 3).astype(np.float32))
    px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None], (H, W))
    py = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None],
                          (H, W))
    val, inb = denoise._bilinear(img, px, py)
    np.testing.assert_allclose(np.asarray(val), np.asarray(img),
                               atol=1e-6)
    assert bool(jnp.all(inb))


def test_moving_camera_reprojection_tracks_point():
    """A world point seen from two cameras reprojects to the pixel the
    previous camera actually rendered it at."""
    cam0 = Camera(position=(0, 0, -3), rotation=(0, 0, 0))
    cam1 = Camera(position=(0.4, 0, -3), rotation=(0, -0.1, 0))
    a0 = cam_arrays(cam0)
    # Render a fake frame from cam0: world points on a wall at z=2
    origin, basis, tan_half, aspect = cam0.ray_params(W, H)
    o, d = primary_rays(origin, basis, tan_half, aspect, W, H)
    tz = (2.0 - o[..., 2]) / d[..., 2]
    world = o + tz[..., None] * d
    # From cam1's view of the same points, project into cam0
    px, py, z = denoise._project(world, a0.origin, a0.basis,
                                 a0.tan_half_fovy, a0.aspect, W, H)
    np.testing.assert_allclose(
        np.asarray(px), np.broadcast_to(np.arange(W)[None, :], (H, W)),
        rtol=0, atol=1e-3)
    assert float(jnp.min(z)) > 0
