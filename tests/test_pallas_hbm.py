"""HBM-streamed leaf fetch (big-scene mode) matches the VMEM path."""
import numpy as np
import jax.numpy as jnp

import hrt_tpu.ops.traversal_pallas as tp
from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal


def test_hbm_leaf_path_matches(monkeypatch):
    sc = Scene()
    s = sc.add_mesh(icosphere(2))
    m = sc.create_material()
    sc.create_instance(s, m)
    p = sc.add_mesh(plane(4.0))
    sc.create_instance(p, m, position=(0, 1.2, 0))
    data = sc.build()
    accel = lbvh.build_bvh(data, leaf_size=8)

    rs = np.random.RandomState(9)
    n = 333  # unique ray count -> unique trace shape (fresh compile)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 5.0
    tgt = rs.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    monkeypatch.setattr(tp, "MAX_VMEM_F32", 100)  # force HBM leaf DMA
    t_h, i_h, u_h, v_h = tp.closest_hit(data, accel, o, d, 1e-3, 1e32)
    occ_h = tp.any_hit(data, accel, o, d, 1e-3,
                       jnp.full((n,), 3.0, jnp.float32))

    t_r, i_r, u_r, v_r = traversal.closest_hit_bvh(
        data, accel, o, d, 1e-3, 1e32, use_pallas=False)
    occ_r = traversal.any_hit_bvh(data, accel, o, d, 1e-3,
                                  jnp.full((n,), 3.0, jnp.float32),
                                  use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i_h), np.asarray(i_r))
    both = np.asarray(i_r) >= 0
    np.testing.assert_allclose(np.asarray(t_h)[both],
                               np.asarray(t_r)[both], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(occ_h), np.asarray(occ_r))


def _rand_rays(n, seed=11):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 5.0
    tgt = rs.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _build_scene(sub=3, leaf=8):
    sc = Scene()
    s = sc.add_mesh(icosphere(sub))
    m = sc.create_material()
    sc.create_instance(s, m)
    p = sc.add_mesh(plane(4.0))
    sc.create_instance(p, m, position=(0, 1.2, 0))
    data = sc.build()
    return data, lbvh.build_bvh(data, leaf_size=leaf)


def test_hbm_node_stream_matches(monkeypatch):
    """Node table past the VMEM budget streams row-by-row from HBM
    through the per-walk cache — exact vs the jnp stack traversal."""
    data, accel = _build_scene()
    assert accel.flat.nodes.shape[0] >= 3  # multi-row walk
    o, d = _rand_rays(517)
    n = o.shape[0]

    monkeypatch.setattr(tp, "MAX_NODE_F32", 100)  # force node streaming
    t_h, i_h, u_h, v_h = tp.closest_hit(data, accel, o, d, 1e-3, 1e32)
    occ_h = tp.any_hit(data, accel, o, d, 1e-3,
                       jnp.full((n,), 3.0, jnp.float32))

    t_r, i_r, _, _ = traversal.closest_hit_bvh(
        data, accel, o, d, 1e-3, 1e32, use_pallas=False)
    occ_r = traversal.any_hit_bvh(data, accel, o, d, 1e-3,
                                  jnp.full((n,), 3.0, jnp.float32),
                                  use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i_h), np.asarray(i_r))
    both = np.asarray(i_r) >= 0
    np.testing.assert_allclose(np.asarray(t_h)[both],
                               np.asarray(t_r)[both], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(occ_h), np.asarray(occ_r))


def test_hbm_node_and_leaf_stream_matches(monkeypatch):
    """Both tables in HBM (the >MAX_VMEM scene): node rows AND leaf
    triangle blocks DMA on demand."""
    data, accel = _build_scene()
    o, d = _rand_rays(473, seed=5)
    monkeypatch.setattr(tp, "MAX_NODE_F32", 100)
    monkeypatch.setattr(tp, "MAX_VMEM_F32", 100)
    t_h, i_h, _, _ = tp.closest_hit(data, accel, o, d, 1e-3, 1e32)
    t_r, i_r, _, _ = traversal.closest_hit_bvh(
        data, accel, o, d, 1e-3, 1e32, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i_h), np.asarray(i_r))
    both = np.asarray(i_r) >= 0
    np.testing.assert_allclose(np.asarray(t_h)[both],
                               np.asarray(t_r)[both], rtol=1e-5)
