"""Disney BRDF analytic checks + sampler PDF validation."""
import numpy as np
import jax
import jax.numpy as jnp

from hrt_tpu.models import materials as M
from hrt_tpu.ops import disney, sampling
from hrt_tpu.ops.math3d import dot, normalize, to_world


def mat_row(**kw):
    from hrt_tpu.models.materials import make_material

    return jnp.asarray(make_material(**kw))[None]


N_UP = jnp.asarray([[0.0, 0.0, 1.0]])


def test_brdf_zero_below_horizon():
    mat = mat_row(color=(0.5, 0.5, 0.5))
    v = normalize(jnp.asarray([[0.3, 0.1, 0.9]]))
    l = normalize(jnp.asarray([[0.2, 0.0, -0.5]]))  # below surface
    f = disney.brdf(mat, N_UP, v, l)
    np.testing.assert_array_equal(np.asarray(f), 0.0)


def test_diffuse_white_furnace_bound():
    """Integral of f*cos over the hemisphere stays <= ~1 for a rough
    white diffuse material (energy conservation sanity)."""
    mat = mat_row(color=(1.0, 1.0, 1.0), metallic=0.0, roughness=1.0,
                  specular=0.0)
    rs = np.random.RandomState(0)
    n = 20000
    u = rs.rand(n, 2)
    # cosine-weighted sampling: estimate = mean(f * pi)
    local, _ = sampling.cosine_hemisphere(jnp.asarray(u[:, 0]),
                                          jnp.asarray(u[:, 1]))
    v = normalize(jnp.asarray([[0.0, 0.4, 0.9]]))
    f = disney.brdf(jnp.tile(mat, (n, 1)), jnp.tile(N_UP, (n, 1)),
                    jnp.tile(v, (n, 1)), local)
    est = float(jnp.mean(f[:, 0]) * np.pi)
    assert 0.3 < est < 1.3, est


def test_brdf_reciprocity_diffuse():
    """Pure-diffuse term should be symmetric in V <-> L."""
    mat = mat_row(color=(0.6, 0.5, 0.4), roughness=0.8, specular=0.0)
    v = normalize(jnp.asarray([[0.3, -0.2, 0.93]]))
    l = normalize(jnp.asarray([[-0.5, 0.1, 0.86]]))
    f_vl = np.asarray(disney.brdf(mat, N_UP, v, l))
    f_lv = np.asarray(disney.brdf(mat, N_UP, l, v))
    np.testing.assert_allclose(f_vl, f_lv, rtol=1e-4)


def test_metallic_reflectance_tinted():
    """Metal specular should carry the base color tint."""
    mat = mat_row(color=(0.9, 0.4, 0.1), metallic=1.0, roughness=0.3)
    v = normalize(jnp.asarray([[0.0, 0.5, 0.87]]))
    l = normalize(jnp.asarray([[0.0, -0.5, 0.87]]))
    f = np.asarray(disney.brdf(mat, N_UP, v, l))[0]
    assert f[0] > f[2] * 1.5  # red >> blue


def test_gtr2_normalization():
    """GTR2 D integrates to ~1 over the hemisphere (projected)."""
    a = 0.3
    rs = np.random.RandomState(1)
    n = 200000
    # uniform hemisphere sampling of H
    u = rs.rand(n, 2)
    cos_t = u[:, 0]
    sin_t = np.sqrt(1 - cos_t**2)
    phi = 2 * np.pi * u[:, 1]
    d_vals = np.asarray(disney.gtr2(jnp.asarray(cos_t), a))
    # integral of D(h) cos(h) dh over hemisphere = 1; uniform pdf = 1/2pi
    est = float(np.mean(d_vals * cos_t) * 2 * np.pi)
    assert abs(est - 1.0) < 0.05, est


def test_cosine_hemisphere_distribution():
    rs = np.random.RandomState(2)
    n = 100000
    d, pdf = sampling.cosine_hemisphere(jnp.asarray(rs.rand(n)),
                                        jnp.asarray(rs.rand(n)))
    d = np.asarray(d)
    assert (d[:, 2] >= 0).all()
    # E[cos] for cosine-weighted = 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.asarray(pdf),
                               d[:, 2] / np.pi, atol=1e-5)


def test_vndf_sample_above_surface_and_reflects():
    mat = jnp.tile(mat_row(metallic=1.0, roughness=0.4), (4096, 1))
    rs = np.random.RandomState(3)
    n_w = jnp.tile(N_UP, (4096, 1))
    v = jnp.tile(normalize(jnp.asarray([[0.4, 0.2, 0.89]])), (4096, 1))
    d, w = sampling.ggx_vndf_spherical_cap(
        mat, v, n_w, jnp.asarray(rs.rand(4096), jnp.float32),
        jnp.asarray(rs.rand(4096), jnp.float32))
    d, w = np.asarray(d), np.asarray(w)
    up = np.asarray(dot(jnp.asarray(d), n_w))
    ok = w > 0
    assert ok.mean() > 0.95
    assert (up[ok] > -1e-4).all()
    assert (w[ok] <= 1.0 + 1e-4).all()  # G2/G1 <= 1


def test_vndf_mirror_limit():
    """roughness -> 0: sampled direction approaches the mirror direction."""
    mat = jnp.tile(mat_row(metallic=1.0, roughness=1e-3), (256, 1))
    rs = np.random.RandomState(4)
    n_w = jnp.tile(N_UP, (256, 1))
    v = jnp.tile(normalize(jnp.asarray([[0.5, 0.0, 0.866]])), (256, 1))
    d, w = sampling.ggx_vndf_spherical_cap(
        mat, v, n_w, jnp.asarray(rs.rand(256), jnp.float32),
        jnp.asarray(rs.rand(256), jnp.float32))
    mirror = np.asarray([-0.5, 0.0, 0.866])
    err = np.linalg.norm(np.asarray(d) - mirror, axis=-1)
    assert np.median(err) < 0.01
