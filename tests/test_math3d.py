import numpy as np
import jax.numpy as jnp

from hrt_tpu.ops import math3d as m3


def rand_unit(n, seed=0):
    rs = np.random.RandomState(seed)
    v = rs.randn(n, 3).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_orthonormal_basis_properties():
    n = rand_unit(256, 1)
    # include the degenerate pole
    n[0] = (0, 0, -1)
    n[1] = (0, 0, 1)
    t, b = m3.orthonormal_basis(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0, atol=1e-4)
    np.testing.assert_allclose(np.sum(b * n, -1), 0, atol=1e-4)
    np.testing.assert_allclose(np.sum(t * b, -1), 0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1, atol=1e-4)
    # right-handed: t x b == n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-4)


def test_to_local_roundtrip():
    n = rand_unit(128, 2)
    v = rand_unit(128, 3)
    local = m3.to_local(jnp.asarray(v), jnp.asarray(n))
    back = m3.to_world(local, jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-4)
    # z-component equals dot(v, n)
    np.testing.assert_allclose(
        np.asarray(local)[..., 2], np.sum(v * n, -1), atol=1e-4)


def test_reflect():
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = np.asarray(m3.reflect(v, n))
    np.testing.assert_allclose(r, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_transform_point_dir():
    mat = jnp.asarray([[[2.0, 0, 0, 1.0], [0, 3.0, 0, 2.0],
                        [0, 0, 4.0, 3.0]]])
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(m3.transform_point(mat, p)), [[3.0, 5.0, 7.0]])
    np.testing.assert_allclose(
        np.asarray(m3.transform_dir(mat, p)), [[2.0, 3.0, 4.0]])
