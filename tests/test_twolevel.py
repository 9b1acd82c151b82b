"""Two-level BLAS/TLAS vs the flattened single-level path."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models.mesh import cube, icosphere
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal, twolevel


def make_scene():
    sc = Scene()
    ball = sc.add_mesh(icosphere(1))
    box = sc.add_mesh(cube(0.5))
    m = sc.create_material()
    sc.create_instance(ball, m, position=(0, 0, 0))
    sc.create_instance(box, m, position=(2.0, 0.5, 0.0),
                       rotation=(0.3, 0.7, -0.2), scale=(1.5, 0.8, 1.2))
    sc.create_instance(ball, m, position=(-2.0, 0, 1.0),
                       scale=(0.5, 0.5, 0.5))
    return sc


def rays(n=512, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 6.0
    tgt = rs.uniform(-2.2, 2.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_two_level_matches_flattened():
    sc = make_scene()
    data = sc.build()
    accel_flat = lbvh.build_bvh(data, leaf_size=8)
    tl = twolevel.build_two_level(sc, leaf_size=8)
    o, d = rays()

    t_f, tri_f, u_f, v_f = traversal.closest_hit_bvh(
        data, accel_flat, o, d, 1e-3, 1e32, use_pallas=False)
    t_t, inst_t, tri_t, u_t, v_t = twolevel.trace_two_level(
        tl, o, d, 1e32, leaf_size=8)

    hit_f = np.asarray(tri_f) >= 0
    hit_t = np.asarray(inst_t) >= 0
    assert (hit_f == hit_t).mean() > 0.995
    both = hit_f & hit_t
    np.testing.assert_allclose(np.asarray(t_t)[both],
                               np.asarray(t_f)[both], rtol=2e-4,
                               atol=2e-4)
    # Hit instance agrees with the flattened pool's instance id
    flat_inst = np.asarray(data.tri_inst)[np.asarray(tri_f)[both]]
    assert (np.asarray(inst_t)[both] == flat_inst).mean() > 0.98


def test_two_level_normals_match_flattened():
    sc = make_scene()
    data = sc.build()
    accel_flat = lbvh.build_bvh(data, leaf_size=8)
    tl = twolevel.build_two_level(sc, leaf_size=8)
    o, d = rays(seed=5)

    t_f, tri_f, u_f, v_f = traversal.closest_hit_bvh(
        data, accel_flat, o, d, 1e-3, 1e32, use_pallas=False)
    t_t, inst_t, tri_t, u_t, v_t = twolevel.trace_two_level(
        tl, o, d, 1e32, leaf_size=8)
    from hrt_tpu.renderer import interpolate_hit

    n_flat, _, mat_flat = interpolate_hit(data, tri_f, u_f, v_f)
    n_tl, _, mat_tl = twolevel.shade_attrs_two_level(tl, inst_t, tri_t,
                                                     u_t, v_t)
    both = (np.asarray(tri_f) >= 0) & (np.asarray(inst_t) >= 0)
    same_tri = both & (np.asarray(mat_flat) == np.asarray(mat_tl))
    dots = np.sum(np.asarray(n_flat) * np.asarray(n_tl), -1)
    assert (dots[same_tri] > 0.999).mean() > 0.98


def test_instance_move_without_rebuild():
    """Moving an instance = updating TLAS rows only (no BLAS rebuild)."""
    sc = make_scene()
    tl = twolevel.build_two_level(sc, leaf_size=8)
    o = jnp.asarray([[4.0, 0.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t0, inst0, *_ = twolevel.trace_two_level(tl, o, d, 1e32, leaf_size=8)
    assert int(inst0[0]) == -1  # nothing at x=4

    # Move the first ball to x=4 by editing its TLAS entry.
    from hrt_tpu.models.instance import MeshInstance

    moved = MeshInstance(0, 0, (4.0, 0.0, 0.0))
    tl2 = tl._replace(
        inst_bmin=tl.inst_bmin.at[0].set(jnp.asarray([3.0, -1.0, -1.0])),
        inst_bmax=tl.inst_bmax.at[0].set(jnp.asarray([5.0, 1.0, 1.0])),
        world_from_obj=tl.world_from_obj.at[0].set(
            jnp.asarray(moved.transform)),
        obj_from_world=tl.obj_from_world.at[0].set(
            jnp.asarray(moved.inverse_transform)),
    )
    t1, inst1, *_ = twolevel.trace_two_level(tl2, o, d, 1e32, leaf_size=8)
    assert int(inst1[0]) == 0  # the moved ball is now hit
