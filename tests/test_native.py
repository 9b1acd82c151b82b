"""Native C++ components vs their Python oracles (skipped gracefully
when no toolchain can build the library)."""
import numpy as np
import jax.numpy as jnp
import pytest

from hrt_tpu import native
from hrt_tpu.models.mesh import icosphere, load_obj, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal
from hrt_tpu.utils import oracle

needs_native = pytest.mark.skipif(native.lib() is None,
                                  reason="native lib unavailable")

OBJ = ("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
       "vn 0 0 1\nvt 0 0\nvt 1 1\n"
       "f 1/1/1 2/2/1 3/1/1\nf 1/1/1 3/1/1 4/2/1\nf -4 -3 -2 -1\n")


@needs_native
def test_native_obj_matches_python(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(OBJ)
    m_nat = load_obj(str(p))
    m_py = load_obj(OBJ, is_text=True)
    np.testing.assert_array_equal(m_nat.vertices, m_py.vertices)
    np.testing.assert_array_equal(m_nat.indices, m_py.indices)


def _scene():
    sc = Scene()
    s = sc.add_mesh(icosphere(2))
    m = sc.create_material()
    sc.create_instance(s, m)
    sc.create_instance(s, m, position=(2.0, 0, 1.0), scale=(0.4,) * 3)
    p = sc.add_mesh(plane(5.0))
    sc.create_instance(p, m, position=(0, 1.5, 0))
    return sc.build()


@needs_native
def test_sah_closest_matches_oracle():
    data = _scene()
    accel = lbvh.build_bvh_sah(data, leaf_size=16)
    rs = np.random.RandomState(0)
    n = 384
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 5.0
    tgt = rs.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t, tri, _, _ = traversal.closest_hit_bvh(
        data, accel, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e32,
        use_pallas=False)
    ot, oi, _, _ = oracle.closest_hit(
        o, d, np.asarray(data.tri_v0), np.asarray(data.tri_e1),
        np.asarray(data.tri_e2))
    tri = np.asarray(tri)
    assert ((tri >= 0) == (oi >= 0)).mean() > 0.995
    both = (tri >= 0) & (oi >= 0)
    np.testing.assert_allclose(np.asarray(t)[both], ot[both], rtol=5e-4,
                               atol=5e-4)


@needs_native
def test_sah_respects_tri_mask():
    data = _scene()
    # Mask out everything except the plane (last instance)
    mask = jnp.asarray(np.asarray(data.tri_inst) == 2)
    accel = lbvh.build_bvh_sah(data, leaf_size=16, tri_mask=mask)
    o = jnp.asarray([[0.0, 0.0, -4.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, tri, _, _ = traversal.closest_hit_bvh(data, accel, o, d, 1e-3,
                                             1e32, use_pallas=False)
    assert int(tri[0]) == -1  # sphere masked out; ray misses the plane


@needs_native
def test_sah_small_scene_single_leaf():
    sc = Scene()
    p = sc.add_mesh(plane(1.0))
    m = sc.create_material()
    sc.create_instance(p, m)
    data = sc.build()  # 2 valid triangles, leaf_size 16 -> 1 leaf
    accel = lbvh.build_bvh_sah(data, leaf_size=16)
    o = jnp.asarray([[0.2, -2.0, 0.1]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    t, tri, _, _ = traversal.closest_hit_bvh(data, accel, o, d, 1e-3,
                                             1e32, use_pallas=False)
    assert int(tri[0]) >= 0
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-5)
