"""Experimental implicit BVH8 (ops/wide.py + ops/traversal_wide.py)
vs the jnp stack traversal."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal, traversal_wide, wide


def scene_data():
    sc = Scene()
    s = sc.add_mesh(icosphere(2))
    m = sc.create_material()
    sc.create_instance(s, m)
    sc.create_instance(s, m, position=(2.5, 0, 1.0), scale=(0.5,) * 3)
    p = sc.add_mesh(plane(6.0))
    sc.create_instance(p, m, position=(0, 1.5, 0))
    return sc.build()


def rays(n=600, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 6.0
    tgt = rs.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_wide_build_shapes():
    data = scene_data()
    accel = lbvh.build_bvh(data, leaf_size=16)
    wa = wide.build_wide(accel)
    nl = accel.tree.tri_v0.shape[0] // 16
    assert wa.num_leaves == nl
    assert wide.ARITY ** wa.levels >= nl


def test_wide_matches_jnp_traversal():
    data = scene_data()
    accel = lbvh.build_bvh(data, leaf_size=16)
    wa = wide.build_wide(accel)
    o, d = rays()
    t_r, i_r, _, _ = traversal.closest_hit_bvh(
        data, accel, o, d, 1e-3, 1e32, use_pallas=False)
    t_w, i_w, _, _ = traversal_wide.closest_hit(data, wa, o, d, 1e-3,
                                                1e32)
    np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_w))
    both = np.asarray(i_r) >= 0
    np.testing.assert_allclose(np.asarray(t_r)[both],
                               np.asarray(t_w)[both], rtol=1e-5)


def test_wide_any_hit():
    data = scene_data()
    accel = lbvh.build_bvh(data, leaf_size=16)
    wa = wide.build_wide(accel)
    o, d = rays(seed=3)
    tmax = jnp.full((o.shape[0],), 4.0, jnp.float32)
    occ_r = traversal.any_hit_bvh(data, accel, o, d, 1e-3, tmax,
                                  use_pallas=False)
    occ_w = traversal_wide.any_hit(data, wa, o, d, 1e-3, tmax)
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_w))
