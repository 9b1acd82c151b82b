"""Scene-sharded tracing on the 8-device CPU mesh vs single-device."""
import numpy as np
import jax
import jax.numpy as jnp

from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal
from hrt_tpu.parallel import scene_shard, tiles


def build_scene():
    sc = Scene()
    s = sc.add_mesh(icosphere(2))
    m = sc.create_material()
    sc.create_instance(s, m)
    sc.create_instance(s, m, position=(2.0, 0.0, 1.0), scale=(0.5,) * 3)
    p = sc.add_mesh(plane(5.0))
    sc.create_instance(p, m, position=(0, 1.5, 0))
    return sc.build(pad=8 * 128)  # divisible into 8 shards


def rays(n=512, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 5.0
    tgt = rs.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_sharded_matches_single_device():
    data = build_scene()
    mesh = tiles.make_mesh(8)
    mesh = jax.sharding.Mesh(mesh.devices, ("shards",))
    sharded, accel = scene_shard.build_sharded_accel(data, 8, leaf_size=8)
    o, d = rays()
    t_s, tri_s, u_s, v_s = scene_shard.closest_hit_sharded(
        sharded, accel, o, d, mesh, leaf_size=8)

    accel_full = lbvh.build_bvh(data, leaf_size=8)
    t_f, tri_f, u_f, v_f = traversal.closest_hit_bvh(
        data, accel_full, o, d, 1e-3, 1e32, use_pallas=False)

    tri_s, tri_f = np.asarray(tri_s), np.asarray(tri_f)
    assert ((tri_s >= 0) == (tri_f >= 0)).all()
    both = tri_f >= 0
    np.testing.assert_allclose(np.asarray(t_s)[both],
                               np.asarray(t_f)[both], rtol=1e-5)
    # Same triangle (ties possible on shared edges)
    assert (tri_s[both] == tri_f[both]).mean() > 0.97


def test_shard_split_roundtrip():
    data = build_scene()
    sharded = scene_shard.shard_scene_triangles(data, 8)
    flat = scene_shard.unshard_tri_attr(sharded, "tri_v0")
    np.testing.assert_array_equal(np.asarray(flat),
                                  np.asarray(data.tri_v0))
