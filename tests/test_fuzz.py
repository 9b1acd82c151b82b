"""Randomized cross-validation: pallas kernel + jnp traversal + brute
force vs the float64 oracle over random scenes and rays."""
import numpy as np
import jax.numpy as jnp
import pytest

from hrt_tpu.models.scene import SceneData
from hrt_tpu.models import lights as L
from hrt_tpu.ops import lbvh, traversal, traversal_pallas
from hrt_tpu.utils import oracle


def random_scene_data(seed, n_tris=200, spread=3.0, tri_size=0.8):
    rs = np.random.RandomState(seed)
    pad = 128 * ((n_tris + 127) // 128)
    v0 = np.zeros((pad, 3), np.float32)
    e1 = np.zeros((pad, 3), np.float32)
    e2 = np.zeros((pad, 3), np.float32)
    v0[:n_tris] = rs.uniform(-spread, spread, (n_tris, 3))
    e1[:n_tris] = rs.uniform(-tri_size, tri_size, (n_tris, 3))
    e2[:n_tris] = rs.uniform(-tri_size, tri_size, (n_tris, 3))
    valid = np.zeros(pad, np.float32)
    valid[:n_tris] = 1.0
    zero3 = np.zeros((pad, 3), np.float32)
    zero2 = np.zeros((pad, 2), np.float32)
    return SceneData(
        tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2),
        nrm0=jnp.asarray(zero3), nrm1=jnp.asarray(zero3),
        nrm2=jnp.asarray(zero3),
        uv0=jnp.asarray(zero2), uv1=jnp.asarray(zero2),
        uv2=jnp.asarray(zero2),
        tri_mat=jnp.zeros(pad, jnp.int32),
        tri_inst=jnp.zeros(pad, jnp.int32),
        tri_valid=jnp.asarray(valid),
        materials=jnp.zeros((1, 20), jnp.float32),
        lights=jnp.zeros((0, L.LIGHT_W), jnp.float32),
        sky=jnp.zeros(22, jnp.float32),
        inst_bmin=jnp.zeros((1, 3)), inst_bmax=jnp.zeros((1, 3)),
    ), v0, e1, e2


def random_rays(seed, n=400, spread=6.0):
    rs = np.random.RandomState(seed + 1000)
    o = rs.uniform(-spread, spread, (n, 3)).astype(np.float32)
    tgt = rs.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_all_paths_vs_oracle(seed):
    data, v0, e1, e2 = random_scene_data(seed)
    o, d = random_rays(seed)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    ot, oi, _, _ = oracle.closest_hit(o, d, v0, e1, e2)

    accel = lbvh.build_bvh(data, leaf_size=8)
    for name, (t, tri) in {
        "jnp": traversal.closest_hit_bvh(data, accel, oj, dj, 1e-3,
                                         1e32, use_pallas=False)[:2],
        "pallas": traversal_pallas.closest_hit(data, accel, oj, dj,
                                               1e-3, 1e32)[:2],
    }.items():
        tri = np.asarray(tri)
        agree = (tri >= 0) == (oi >= 0)
        assert agree.mean() > 0.99, f"{name} seed {seed}"
        both = (tri >= 0) & (oi >= 0)
        np.testing.assert_allclose(
            np.asarray(t)[both], ot[both], rtol=1e-3, atol=1e-3,
            err_msg=f"{name} seed {seed}")

    # occlusion
    tmax = np.full(o.shape[0], 5.0, np.float32)
    occ_o = oracle.any_hit(o, d, v0, e1, e2, t_max=tmax)
    occ_p = np.asarray(traversal_pallas.any_hit(
        data, accel, oj, dj, 1e-3, jnp.asarray(tmax)))
    assert (occ_p == occ_o).mean() > 0.99, f"pallas anyhit seed {seed}"
