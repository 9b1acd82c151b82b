"""LBVH build invariants + traversal vs the numpy oracle."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal
from hrt_tpu.ops.morton import expand_bits_10, morton3d
from hrt_tpu.utils import oracle


def build_scene(n_sub=2, extra_plane=True):
    sc = Scene()
    s = sc.add_mesh(icosphere(n_sub))
    m = sc.create_material()
    sc.create_instance(s, m)
    sc.create_instance(s, m, position=(2.5, 0, 1.0), scale=(0.5,) * 3)
    if extra_plane:
        p = sc.add_mesh(plane(6.0))
        sc.create_instance(p, m, position=(0, 1.5, 0))
    return sc.build()


def rays_toward_origin(n=512, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 6.0
    target = rs.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_morton_expand_bits():
    got = np.asarray(expand_bits_10(jnp.asarray([0b111, 1, 1023],
                                                jnp.uint32)))
    assert got[0] == 0b1001001  # bit k -> position 3k
    assert got[1] == 1
    assert got[2] == 0b1001001001001001001001001001  # 10 spread bits


def test_morton_order():
    # interleave: x gets bit 2, y bit 1, z bit 0
    assert int(morton3d(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0))) == 4
    assert int(morton3d(jnp.uint32(0), jnp.uint32(1), jnp.uint32(0))) == 2
    assert int(morton3d(jnp.uint32(0), jnp.uint32(0), jnp.uint32(1))) == 1


def _tree_check(bvh, n_leaf):
    """Every leaf reachable exactly once; children well-formed."""
    child_l = np.asarray(bvh.child_l)
    child_r = np.asarray(bvh.child_r)
    ni = child_l.shape[0]
    assert ni == n_leaf - 1
    seen_leaf = np.zeros(n_leaf, int)
    seen_node = np.zeros(ni, int)
    stack = [0]
    seen_node[0] = 1
    while stack:
        e = stack.pop()
        for c in (child_l[e], child_r[e]):
            if c < 0:
                seen_leaf[-(c + 1)] += 1
            else:
                seen_node[c] += 1
                stack.append(c)
    assert (seen_leaf == 1).all(), "each leaf visited exactly once"
    assert (seen_node == 1).all(), "each internal node has one parent"


def test_hierarchy_is_a_tree():
    data = build_scene()
    accel = lbvh.build_bvh(data, leaf_size=8); bvh = accel.tree
    _tree_check(bvh, data.num_triangles // 8)


def test_node_boxes_contain_children():
    data = build_scene()
    accel = lbvh.build_bvh(data, leaf_size=8); bvh = accel.tree
    # root box must contain all valid triangles
    root_min = np.minimum(np.asarray(bvh.bmin_l[0]), np.asarray(bvh.bmin_r[0]))
    root_max = np.maximum(np.asarray(bvh.bmax_l[0]), np.asarray(bvh.bmax_r[0]))
    valid = np.asarray(data.tri_valid) > 0.5
    v0 = np.asarray(data.tri_v0)[valid]
    v1 = v0 + np.asarray(data.tri_e1)[valid]
    v2 = v0 + np.asarray(data.tri_e2)[valid]
    pts = np.concatenate([v0, v1, v2])
    assert (pts >= root_min - 1e-4).all()
    assert (pts <= root_max + 1e-4).all()


def test_bvh_closest_matches_oracle():
    data = build_scene()
    accel = lbvh.build_bvh(data, leaf_size=8); bvh = accel.tree
    o, d = rays_toward_origin(512)
    t, tri, u, v = traversal.closest_hit_bvh(data, accel, o, d, 1e-3, 1e32)
    t, tri = np.asarray(t), np.asarray(tri)
    ot, oidx, _, _ = oracle.closest_hit(
        np.asarray(o), np.asarray(d), np.asarray(data.tri_v0),
        np.asarray(data.tri_e1), np.asarray(data.tri_e2))
    hit_match = (tri >= 0) == (oidx >= 0)
    assert hit_match.mean() > 0.995, f"hit/miss mismatch {hit_match.mean()}"
    both = (tri >= 0) & (oidx >= 0)
    np.testing.assert_allclose(t[both], ot[both], rtol=5e-4, atol=5e-4)
    # triangle ids match except near-tie edges
    assert (tri[both] == oidx[both]).mean() > 0.98


def test_bvh_any_hit_matches_oracle():
    data = build_scene()
    accel = lbvh.build_bvh(data, leaf_size=8); bvh = accel.tree
    o, d = rays_toward_origin(512, seed=7)
    t_max = jnp.full((512,), 4.0, jnp.float32)
    got = np.asarray(traversal.any_hit_bvh(data, accel, o, d, 1e-3, t_max))
    want = oracle.any_hit(
        np.asarray(o), np.asarray(d), np.asarray(data.tri_v0),
        np.asarray(data.tri_e1), np.asarray(data.tri_e2),
        t_max=np.asarray(t_max))
    assert (got == want).mean() > 0.995


def test_bvh_render_matches_bruteforce():
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.renderer import camera_arrays, render_frame

    data = build_scene(1)
    accel = lbvh.build_bvh(data, leaf_size=8); bvh = accel.tree
    cfg_bf = RenderConfig(width=64, height=48, max_depth=1, sky=True,
                          traversal="bruteforce")
    cfg_bvh = RenderConfig(width=64, height=48, max_depth=1, sky=True,
                           traversal="bvh")
    cam = camera_arrays(Camera(position=(0, -1, -5)), cfg_bf)
    img_bf = np.asarray(render_frame(data, None, cam, jnp.uint32(0), cfg_bf))
    img_bv = np.asarray(render_frame(data, accel, cam, jnp.uint32(0),
                                     cfg_bvh))
    # identical up to traversal tie-breaks on shared edges
    diff = np.abs(img_bf - img_bv).max(axis=-1)
    assert (diff < 1e-4).mean() > 0.995
