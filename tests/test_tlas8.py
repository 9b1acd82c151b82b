"""Wide (sublane-record BVH8) two-level traversal vs the world-soup
oracle (ops/traversal_tlas8.py).

Runs in interpret mode on the CPU suite (HRT_WIDE8_CPU opts the
dispatch in), so the scene is deliberately tiny — interpret-mode cost
scales with (visits x per-visit op count) and the wide kernel's exact
node test is ~25x the binary kernel's op count per visit.  TPU-scale
validation runs in scripts/bench_full.py's instanced config.  Closest /
any-hit must agree with the soup exactly in hit terms — the walk order
differs but Moller tests and the closest-min are order-independent.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, tlas, traversal
from hrt_tpu.ops.v3 import V3

from test_tlas import _rays


def _small_instanced_scene():
    sc = Scene()
    sph = sc.add_mesh(icosphere(1))     # 320 tris
    gnd = sc.add_mesh(plane(6.0))
    m0 = sc.create_material((0.8, 0.8, 0.8), 0.0, 0.8)
    m1 = sc.create_material((0.9, 0.6, 0.2), 1.0, 0.2)
    sc.create_light((0.0, -4.0, -2.0), (1.0, 1.0, 1.0), 25.0)
    sc.create_instance(gnd, m0, (0.0, 1.0, 0.0))
    sc.create_instance(sph, m1, (0.0, 0.0, 0.0))
    sc.create_instance(sph, m0, (-1.8, 0.3, 1.0),
                       rotation=(0.3, 1.1, -0.4), scale=(0.6, 0.6, 0.6))
    return sc


@pytest.fixture(scope="module")
def setup():
    sc = _small_instanced_scene()
    data = sc.build()
    soup = lbvh.build_bvh(data, leaf_size=8)
    tl = tlas.build_two_level_flat(sc, leaf_size=8, sah=False)
    assert tl.w8_nodes is not None, "wide8 build should succeed here"
    return sc, data, soup, tl


def _v3(a):
    return V3(*(jnp.asarray(a[:, i]) for i in range(3)))


def test_wide_table_structure(setup):
    _, _, _, tl = setup
    rec = np.asarray(tl.w8_nodes)
    assert rec.dtype == np.int32 and rec.shape[1:] == (8, 128)
    R = rec.shape[0]
    v = (rec.reshape(R, 8, 16, 8).transpose(0, 2, 1, 3)
         .reshape(R * 16, 8, 8))
    meta = v[:, :, 6]
    # TLAS region: leaf metas are instance ids + 1, every instance
    # present exactly once.
    n_inst = tl.obj_from_world.shape[0]
    tlas_meta = meta[:tl.w8_tlas_nw]
    leaves = tlas_meta[tlas_meta > 0]
    assert leaves.size == n_inst
    assert set(leaves - 1) == set(range(n_inst))
    # BLAS regions: leaf metas point into the global padded tri pool.
    blas_meta = meta[tl.w8_tlas_nw:]
    bl = blas_meta[blas_meta > 0]
    assert (bl - 1 < tl.tris.shape[0] * 128).all()
    assert ((bl - 1) % tl.leaf_size == 0).all()
    # Every instance's BLAS root id lands inside the table, past TLAS.
    roots = np.asarray(tl.w8_root)[:, 0]
    assert (roots >= tl.w8_tlas_nw).all() and (roots < R * 16).all()


def test_wide_closest_matches_soup(setup, monkeypatch):
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    sc, data, soup, tl = setup
    o, d = _rays(300, seed=11)
    t_w, tri_w, inst_w, u_w, v_w = tlas.closest_hit_tlas(
        tl, _v3(o), _v3(d), 1e-3, 1e32)
    t_r, tri_r, _, _ = traversal.closest_hit_bvh(
        data, soup, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e32,
        use_pallas=False)
    hit_w = np.asarray(tri_w) >= 0
    hit_r = np.asarray(tri_r) >= 0
    np.testing.assert_array_equal(hit_w, hit_r)
    np.testing.assert_allclose(np.asarray(t_w)[hit_r],
                               np.asarray(t_r)[hit_r],
                               rtol=2e-4, atol=2e-5)
    inst_oracle = np.asarray(data.tri_inst)[
        np.maximum(np.asarray(tri_r), 0)]
    agree = (np.asarray(inst_w)[hit_r] == inst_oracle[hit_r]).mean()
    assert agree > 0.995, agree


def test_wide_any_hit_matches_soup(setup, monkeypatch):
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    sc, data, soup, tl = setup
    o, d = _rays(300, seed=8)
    reach = jnp.full((o.shape[0],), 4.0, jnp.float32)
    occ_w = tlas.any_hit_tlas(tl, _v3(o), _v3(d), 1e-3, reach)
    occ_r = traversal.any_hit_bvh(data, soup, jnp.asarray(o),
                                  jnp.asarray(d), 1e-3, reach,
                                  use_pallas=False)
    np.testing.assert_array_equal(np.asarray(occ_w), np.asarray(occ_r))


def test_wide_refit(setup, monkeypatch):
    """The wide TLAS region is rebuilt by refit: a moved instance
    stops occluding its old location."""
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    sc, data, soup, tl = setup
    import hrt_tpu.models.instance as inst_mod

    new_instances = list(sc.instances)
    new_instances[1] = inst_mod.MeshInstance(
        new_instances[1].mesh_id, new_instances[1].material_id,
        (0.0, -8.0, 0.0), (0, 0, 0), (1.0, 1.0, 1.0))
    w = jnp.asarray(np.stack([i.transform for i in new_instances]))
    ow = jnp.asarray(np.stack([i.inverse_transform
                               for i in new_instances]))
    nm = jnp.asarray(np.stack([i.normal_matrix for i in new_instances]))
    tl2 = tlas.refit_two_level(tl, w, ow, nm)

    o = V3(*(jnp.asarray([c]) for c in (0.0, 0.0, -5.0)))
    d = V3(*(jnp.asarray([c]) for c in (0.0, 0.0, 1.0)))
    _, tri0, inst0, _, _ = tlas.closest_hit_tlas(tl, o, d, 1e-3, 1e32)
    _, tri1, inst1, _, _ = tlas.closest_hit_tlas(tl2, o, d, 1e-3, 1e32)
    assert int(inst0[0]) == 1          # sphere at origin before
    assert int(inst1[0]) != 1          # gone after the move
