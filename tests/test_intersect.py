"""Brute-force jnp intersectors vs the float64 numpy oracle."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models import mesh as mesh_mod
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import intersect
from hrt_tpu.utils import oracle


def random_scene_arrays(seed=0, n_tris=96):
    rs = np.random.RandomState(seed)
    v0 = rs.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    e1 = rs.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    e2 = rs.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    # pad with degenerates to 128 (scene build parity)
    pad = 128 - n_tris
    v0 = np.concatenate([v0, np.zeros((pad, 3), np.float32)])
    e1 = np.concatenate([e1, np.zeros((pad, 3), np.float32)])
    e2 = np.concatenate([e2, np.zeros((pad, 3), np.float32)])
    return v0, e1, e2


def random_rays(seed=1, n=256):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_closest_hit_matches_oracle():
    v0, e1, e2 = random_scene_arrays()
    o, d = random_rays()
    t, idx, u, v = intersect.closest_hit_bruteforce(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2), chunk=64)
    t, idx = np.asarray(t), np.asarray(idx)
    ot, oidx, ou, ov = oracle.closest_hit(o, d, v0, e1, e2)
    hit = oidx >= 0
    # Same hit/miss classification (allow f32-vs-f64 edge flips on a few)
    assert (hit == (idx >= 0)).mean() > 0.99
    both = hit & (idx >= 0)
    np.testing.assert_allclose(t[both], ot[both], rtol=2e-4, atol=2e-4)
    # Index may differ only on near-equal t ties
    diff = both & (idx != oidx)
    assert diff.mean() < 0.02


def test_any_hit_matches_oracle():
    v0, e1, e2 = random_scene_arrays(3)
    o, d = random_rays(4)
    t_max = np.full(o.shape[0], 3.0, np.float32)
    got = np.asarray(intersect.any_hit_bruteforce(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2), t_max=jnp.asarray(t_max), chunk=64))
    want = oracle.any_hit(o, d, v0, e1, e2, t_max=t_max)
    assert (got == want).mean() > 0.99


def test_degenerate_padding_never_hits():
    v0 = np.zeros((128, 3), np.float32)
    e1 = np.zeros((128, 3), np.float32)
    e2 = np.zeros((128, 3), np.float32)
    o, d = random_rays(5, 64)
    t, idx, _, _ = intersect.closest_hit_bruteforce(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2), chunk=128)
    assert (np.asarray(idx) == -1).all()


def test_plane_hit_geometry():
    """A ray straight down the +y axis (y-down world) hits the y=0 plane."""
    m = mesh_mod.plane(1.0)
    sc = Scene()
    sc.add_mesh(m)
    sc.create_material()
    sc.create_instance(0, 0)
    data = sc.build()
    o = jnp.asarray([[0.25, -2.0, 0.1]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    t, idx, u, v = intersect.closest_hit_bruteforce(
        o, d, data.tri_v0, data.tri_e1, data.tri_e2, chunk=128)
    assert int(idx[0]) >= 0
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-5)


def test_ray_aabb():
    o = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 3.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    inv = intersect.safe_inv_dir(d)
    bmin = jnp.asarray([-1.0, -1.0, -1.0], jnp.float32)
    bmax = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    hit, entry = intersect.ray_aabb(o, inv, bmin, bmax, 1e-3, 1e32)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(entry[0]), 4.0, rtol=1e-5)
