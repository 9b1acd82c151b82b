"""Camera conventions: identity view, basis orthogonality, FOV edges."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models.camera import Camera, orbit_camera, primary_rays


def test_identity_basis():
    cam = Camera(position=(0, 0, -2), rotation=(0, 0, 0))
    b = np.asarray(cam.basis())
    np.testing.assert_allclose(b, np.eye(3), atol=1e-6)


def test_center_ray_points_forward():
    cam = Camera(position=(1, 2, -3), rotation=(0, 0, 0))
    w, h = 64, 64
    o, d = primary_rays(*cam.ray_params(w, h), w, h)
    o, d = np.asarray(o), np.asarray(d)
    np.testing.assert_allclose(o[0, 0], [1, 2, -3], atol=1e-6)
    # Pixel (w/2, h/2) has clip == 0 -> straight +z (forward).
    center = d[h // 2, w // 2]
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-6)


def test_corner_ray_fov():
    cam = Camera(position=(0, 0, 0), rotation=(0, 0, 0),
                 fov_y=np.pi / 2)  # tan(fov/2) = 1
    w = h = 100
    _, d = primary_rays(*cam.ray_params(w, h), w, h)
    d = np.asarray(d)
    # Pixel (0,0): clip = (-1,-1): cam dir ~ normalize((-1, -1, 1))
    want = np.array([-1.0, -1.0, 1.0])
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(d[0, 0], want, atol=1e-5)


def test_yaw_rotation():
    cam = Camera(position=(0, 0, 0), rotation=(0, np.pi / 2, 0))
    b = np.asarray(cam.basis())
    # forward w = (sin yaw, 0, cos yaw) = (1, 0, 0)
    np.testing.assert_allclose(b[2], [1, 0, 0], atol=1e-6)


def test_orbit_camera_looks_at_target():
    for t in (0.0, 1.0, 2.5):
        cam = orbit_camera(t, radius=3.0, height=-1.5, target=(0, 0.5, 0))
        b = np.asarray(cam.basis())
        fwd = b[2]
        to_target = np.asarray([0, 0.5, 0]) - np.asarray(cam.position)
        to_target /= np.linalg.norm(to_target)
        np.testing.assert_allclose(fwd, to_target, atol=1e-5)


def test_jitter_shifts_rays():
    cam = Camera()
    w = h = 8
    params = cam.ray_params(w, h)
    _, d0 = primary_rays(*params, w, h)
    jit = jnp.full((h, w, 2), 0.5, jnp.float32)
    _, d1 = primary_rays(*params, w, h, jitter=jit)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
