"""Two-level (TLAS->BLAS) packet traversal vs the world-soup oracle.

The flattened soup (models/scene.build) and the two-level accel
describe identical world geometry, so closest hits must agree; the
soup's tri_inst table provides the instance oracle.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, tlas, traversal
from hrt_tpu.ops.v3 import V3


def _instanced_scene():
    """Rotated, scaled, translated instances of two meshes."""
    sc = Scene()
    sph = sc.add_mesh(icosphere(2))
    gnd = sc.add_mesh(plane(6.0))
    m0 = sc.create_material((0.8, 0.8, 0.8), 0.0, 0.8)
    m1 = sc.create_material((0.9, 0.6, 0.2), 1.0, 0.2)
    sc.create_light((0.0, -4.0, -2.0), (1.0, 1.0, 1.0), 25.0)
    sc.create_instance(gnd, m0, (0.0, 1.0, 0.0))
    sc.create_instance(sph, m1, (0.0, 0.0, 0.0))
    sc.create_instance(sph, m0, (-1.8, 0.3, 1.0),
                       rotation=(0.3, 1.1, -0.4), scale=(0.6, 0.6, 0.6))
    sc.create_instance(sph, m1, (1.7, 0.4, -0.8),
                       rotation=(0.0, 0.7, 0.2), scale=(0.5, 0.9, 0.5))
    return sc


def _rays(n, seed=3):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 6.0
    tgt = rs.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    sc = _instanced_scene()
    data = sc.build()
    soup = lbvh.build_bvh(data, leaf_size=8)
    tl = tlas.build_two_level_flat(sc, leaf_size=8, sah=False)
    return sc, data, soup, tl


def test_closest_matches_soup(setup):
    sc, data, soup, tl = setup
    o, d = _rays(777)
    n = o.shape[0]
    ov = V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]),
            jnp.asarray(o[:, 2]))
    dv = V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
            jnp.asarray(d[:, 2]))

    t_tl, tri_tl, inst_tl, u_tl, v_tl = tlas.closest_hit_tlas(
        tl, ov, dv, 1e-3, 1e32)
    t_r, tri_r, _, _ = traversal.closest_hit_bvh(
        data, soup, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e32,
        use_pallas=False)

    hit_tl = np.asarray(tri_tl) >= 0
    hit_r = np.asarray(tri_r) >= 0
    np.testing.assert_array_equal(hit_tl, hit_r)
    both = hit_r
    # t in world parameter units on both paths.
    np.testing.assert_allclose(np.asarray(t_tl)[both],
                               np.asarray(t_r)[both],
                               rtol=2e-4, atol=2e-5)
    # Instance oracle from the soup's per-triangle instance table.
    inst_oracle = np.asarray(data.tri_inst)[
        np.maximum(np.asarray(tri_r), 0)]
    # Coincident-surface ties can pick either instance at identical t;
    # require agreement on the overwhelming majority.
    agree = (np.asarray(inst_tl)[both] == inst_oracle[both]).mean()
    assert agree > 0.995, agree


def test_any_hit_matches_soup(setup):
    sc, data, soup, tl = setup
    o, d = _rays(512, seed=8)
    n = o.shape[0]
    reach = jnp.full((n,), 4.0, jnp.float32)
    ov = V3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))
    occ_tl = tlas.any_hit_tlas(tl, ov, dv, 1e-3, reach)
    occ_r = traversal.any_hit_bvh(data, soup, jnp.asarray(o),
                                  jnp.asarray(d), 1e-3, reach,
                                  use_pallas=False)
    np.testing.assert_array_equal(np.asarray(occ_tl), np.asarray(occ_r))


def test_shade_attrs_normals(setup):
    """Shading normals from the two-level path match the soup's
    (world-transformed) interpolated normals."""
    sc, data, soup, tl = setup
    o, d = _rays(256, seed=21)
    ov = V3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))
    t_tl, tri_tl, inst_tl, u_tl, v_tl = tlas.closest_hit_tlas(
        tl, ov, dv, 1e-3, 1e32)
    nrm, mat, rows, _ = tlas.shade_attrs_tlas(tl, data.materials,
                                              tri_tl, inst_tl, u_tl,
                                              v_tl)

    from hrt_tpu.renderer import _shade_attrs_p, _scene_attr_table
    t_r, tri_r, u_r, v_r = traversal.closest_hit_bvh(
        data, soup, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e32,
        use_pallas=False)
    nrm_r, mat_r, _, _ = _shade_attrs_p(_scene_attr_table(data), tri_r,
                                        u_r, v_r)
    hit = np.asarray(tri_r) >= 0
    same_inst = (np.asarray(inst_tl)
                 == np.asarray(data.tri_inst)[
                     np.maximum(np.asarray(tri_r), 0)])
    m = hit & same_inst
    # Shared-edge t-ties can resolve to a different triangle of the
    # same instance (slightly different interpolated normal): require
    # near-exact agreement on >= 99% of lanes.
    for a, b in ((nrm.x, nrm_r.x), (nrm.y, nrm_r.y), (nrm.z, nrm_r.z)):
        close = np.isclose(np.asarray(a)[m], np.asarray(b)[m],
                           rtol=1e-3, atol=2e-3)
        assert close.mean() >= 0.99, close.mean()
    # Material color comes from the instance's material id.
    mats = np.asarray(data.materials)
    expect = mats[np.asarray(tl.inst_mat)[
        np.maximum(np.asarray(inst_tl), 0)]][:, 0]
    np.testing.assert_allclose(np.asarray(mat.color.x)[m],
                               expect[m], rtol=1e-6)


def test_refit_moves_instance(setup):
    """refit_two_level with a translated transform finds the moved
    geometry (and stops hitting the old location)."""
    sc, data, soup, tl = setup
    import hrt_tpu.models.instance as inst_mod

    # Move the unit sphere at origin far away.
    new_instances = list(sc.instances)
    moved = inst_mod.MeshInstance(new_instances[1].mesh_id,
                                  new_instances[1].material_id,
                                  (0.0, -8.0, 0.0), (0, 0, 0),
                                  (1.0, 1.0, 1.0))
    new_instances[1] = moved
    w = jnp.asarray(np.stack([i.transform for i in new_instances]))
    ow = jnp.asarray(np.stack([i.inverse_transform
                               for i in new_instances]))
    nm = jnp.asarray(np.stack([i.normal_matrix for i in new_instances]))
    tl2 = tlas.refit_two_level(tl, w, ow, nm)

    # Ray through the origin: hits sphere 1 before, misses after.
    o = V3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([-5.0]))
    d = V3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.0]))
    _, tri0, inst0, _, _ = tlas.closest_hit_tlas(tl, o, d, 1e-3, 1e32)
    assert int(inst0[0]) == 1
    _, tri1, inst1, _, _ = tlas.closest_hit_tlas(tl2, o, d, 1e-3, 1e32)
    assert int(inst1[0]) != 1

    # Ray toward the new location hits the moved sphere.
    o2 = V3(jnp.asarray([0.0]), jnp.asarray([-8.0]), jnp.asarray([-5.0]))
    _, tri2, inst2, _, _ = tlas.closest_hit_tlas(tl2, o2, d, 1e-3, 1e32)
    assert int(inst2[0]) == 1


def test_frame_parity_two_level_vs_soup():
    """A full rendered frame through the two-level path matches the
    flattened-soup path (identical world geometry + materials)."""
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.frameloop import FrameLoop
    from hrt_tpu.models.camera import Camera

    cfg = RenderConfig(width=64, height=48, max_depth=1, sky=True,
                       jitter=False)
    cam = Camera(position=(0.0, -1.0, -6.0), rotation=(-0.15, 0.0, 0.0))
    img_soup = np.asarray(
        FrameLoop(_instanced_scene(), cfg, cull_threshold_px=0.0)
        .step(cam))
    img_tl = np.asarray(
        FrameLoop(_instanced_scene(), cfg, cull_threshold_px=0.0,
                  two_level=True).step(cam))
    # Shared-edge t-ties may shade a handful of pixels differently.
    close = np.isclose(img_soup, img_tl, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.995, close.mean()
