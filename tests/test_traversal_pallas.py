"""Pallas packet kernel vs the jnp stack traversal (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal, traversal_pallas


def small_scene():
    sc = Scene()
    s = sc.add_mesh(icosphere(1))
    m = sc.create_material()
    sc.create_instance(s, m)
    p = sc.add_mesh(plane(4.0))
    sc.create_instance(p, m, position=(0, 1.2, 0))
    return sc.build()


def rays(n=256, seed=3):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 5.0
    tgt = rs.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_closest_matches_jnp_traversal():
    data = small_scene()
    accel = lbvh.build_bvh(data, leaf_size=8)
    o, d = rays()
    t_r, i_r, u_r, v_r = traversal.closest_hit_bvh(
        data, accel, o, d, 1e-3, 1e32, use_pallas=False)
    t_p, i_p, u_p, v_p = traversal_pallas.closest_hit(
        data, accel, o, d, 1e-3, 1e32)
    i_r, i_p = np.asarray(i_r), np.asarray(i_p)
    np.testing.assert_array_equal(i_r, i_p)
    both = i_r >= 0
    np.testing.assert_allclose(np.asarray(t_r)[both], np.asarray(t_p)[both],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_r)[both], np.asarray(u_p)[both],
                               rtol=1e-4, atol=1e-5)


def test_pallas_any_hit_matches_jnp_traversal():
    data = small_scene()
    accel = lbvh.build_bvh(data, leaf_size=8)
    o, d = rays(seed=11)
    tmax = jnp.full((o.shape[0],), 3.5, jnp.float32)
    occ_r = np.asarray(traversal.any_hit_bvh(data, accel, o, d, 1e-3, tmax,
                                             use_pallas=False))
    occ_p = np.asarray(traversal_pallas.any_hit(data, accel, o, d, 1e-3,
                                                tmax))
    np.testing.assert_array_equal(occ_r, occ_p)


def test_pallas_ray_padding():
    """A non-multiple-of-TILE ray count works and padding never leaks."""
    data = small_scene()
    accel = lbvh.build_bvh(data, leaf_size=8)
    o, d = rays(n=77, seed=5)
    t, tri, u, v = traversal_pallas.closest_hit(data, accel, o, d,
                                                1e-3, 1e32)
    assert t.shape == (77,)
    t_r, i_r, _, _ = traversal.closest_hit_bvh(
        data, accel, o, d, 1e-3, 1e32, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(tri), np.asarray(i_r))
