"""Bounded-motion Pallas warp (ops/warp_pallas) — interpret-mode checks.

The production callers (SVGF temporal_accumulate, upscaler
reproject_history) only use the kernel on real TPU; these tests run it
in interpret mode on tiny shapes with a small margin so the unrolled
offset loop stays fast, and check exactness against the XLA gather
path (ops/denoise._bilinear)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrt_tpu.ops.denoise import _bilinear
from hrt_tpu.ops.warp_pallas import warp_bilinear


@pytest.fixture(scope="module", autouse=True)
def _release_interpret_memory():
    """Interpret-mode executables of the unrolled offset loop are large;
    drop them when the module finishes so later kernel test modules
    (test_wide8 et al.) don't hit host bad_alloc in a full-suite run."""
    yield
    jax.clear_caches()


def _ref(img, px, py):
    val, inb = _bilinear(img, px, py)
    return jnp.where(inb[..., None], val, 0.0), inb


def _grid(ho, wo):
    iy = jnp.arange(ho, dtype=jnp.float32)[:, None] * jnp.ones((1, wo))
    jx = jnp.ones((ho, 1)) * jnp.arange(wo, dtype=jnp.float32)[None, :]
    return jx, iy


def test_identity_warp():
    """px = j, py = i reproduces the image exactly (static camera)."""
    img = jax.random.uniform(jax.random.PRNGKey(0), (128, 128, 3))
    px, py = _grid(128, 128)
    val, valid = warp_bilinear(img, px, py, margin=2)
    assert bool(jnp.all(valid))
    np.testing.assert_array_equal(np.asarray(val), np.asarray(img))


def test_smooth_motion_matches_xla():
    """Sub-margin smooth motion: all in-bounds pixels valid, values
    bit-equal to the gather path."""
    img = jax.random.uniform(jax.random.PRNGKey(1), (128, 128, 4))
    jx, iy = _grid(128, 128)
    px = jx + 1.25 + 0.3 * jnp.sin(iy * 0.05)
    py = iy - 0.75 + 0.3 * jnp.cos(jx * 0.05)
    val, valid = warp_bilinear(img, px, py, margin=3)
    ref, inb = _ref(img, px, py)
    assert bool(jnp.all(valid == inb))
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_out_of_bounds_invalid():
    """Coords outside the source image are invalid and exactly zero."""
    img = jnp.ones((128, 128, 2))
    jx, iy = _grid(128, 128)
    px = jx + 100.0   # right half lands out of image
    py = iy
    val, valid = warp_bilinear(img, px, py, margin=2)
    v = np.asarray(valid)
    assert not v[:, -1].any() and v[:, 0].all()
    assert (np.asarray(val)[~v] == 0).all()


def test_out_of_margin_invalid_zero():
    """A motion outlier beyond the tile margin is flagged invalid and
    returns 0 (the disocclusion contract)."""
    img = jax.random.uniform(jax.random.PRNGKey(2), (128, 128, 1)) + 1.0
    px, py = _grid(128, 128)
    py = py.at[64, 64].add(40.0)  # one pixel with wild motion
    val, valid = warp_bilinear(img, px, py, margin=2)
    v = np.asarray(valid)
    assert not v[64, 64]
    assert np.asarray(val)[64, 64, 0] == 0.0
    # neighbors unaffected
    assert v[64, 63] and v[63, 64]


def test_nonaligned_shapes_padding():
    """Output grid and source not multiples of the 128-tile: padding
    path still matches the gather reference."""
    img = jax.random.uniform(jax.random.PRNGKey(3), (96, 160, 3))
    jx, iy = _grid(100, 150)
    # Motion differential across one 128-px tile must stay within
    # +-margin: a 1.005x zoom sweeps ~0.6 px per tile.
    px = jx * 1.005 - 1.5
    py = iy * 0.995 + 0.5
    val, valid = warp_bilinear(img, px, py, margin=2)
    ref, inb = _ref(img, px, py)
    v = np.asarray(valid)
    assert v.shape == (100, 150)
    # valid is a subset of in-bounds; everything valid matches
    assert not np.any(v & ~np.asarray(inb))
    np.testing.assert_allclose(np.asarray(val)[v], np.asarray(ref)[v],
                               rtol=0, atol=1e-6)
    assert (np.asarray(val)[~v] == 0).all()
    # smooth motion: coverage should be essentially all of in-bounds
    assert v.sum() > 0.95 * np.asarray(inb).sum()


def test_upscale_grid():
    """2x output grid mapping into a smaller source (the temporal
    upscaler shape), fractional coords."""
    img = jax.random.uniform(jax.random.PRNGKey(4), (128, 128, 3))
    jx, iy = _grid(128, 128)
    px = jx + 0.5
    py = iy + 0.5
    val, valid = warp_bilinear(img, px, py, margin=2)
    ref, inb = _ref(img, px, py)
    v = np.asarray(valid)
    assert not np.any(v & ~np.asarray(inb))
    np.testing.assert_allclose(np.asarray(val)[v], np.asarray(ref)[v],
                               rtol=0, atol=1e-6)
