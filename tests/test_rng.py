"""Bit-exactness of the RNG vs a pure-python reimplementation of
shaders/random.slang (xxHash-style hash + PCG stream)."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.ops import rng

M32 = 0xFFFFFFFF


def py_hash3(x, y, z):
    p1, p2, p3, p4 = 2246822519, 3266489917, 668265263, 374761393
    h = (z + p4 + x * p2) & M32
    h = (p3 * (((h << 17) | (h >> 15)) & M32)) & M32
    h = (h + y * p2) & M32
    h = (p3 * (((h << 17) | (h >> 15)) & M32)) & M32
    h = (p1 * (h ^ (h >> 15))) & M32
    h = (p2 * (h ^ (h >> 13))) & M32
    return h ^ (h >> 16)


def py_pcg(state):
    prev = (state * 747796405 + 2891336453) & M32
    word = ((((prev >> ((prev >> 28) + 4)) & M32) ^ prev) * 277803737) & M32
    return ((word >> 22) ^ word) & M32, prev


def test_hash3_bit_exact():
    xs = np.array([0, 1, 2, 123, 799, 2**31], np.uint32)
    ys = np.array([0, 5, 599, 7, 12, 99], np.uint32)
    zs = np.array([0, 0, 1, 2, 3, 1000], np.uint32)
    got = np.asarray(rng.hash3(jnp.asarray(xs), jnp.asarray(ys),
                               jnp.asarray(zs)))
    want = np.array([py_hash3(int(x), int(y), int(z))
                     for x, y, z in zip(xs, ys, zs)], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_pcg_stream_bit_exact():
    state = np.uint32(12345)
    jstate = jnp.asarray(state)
    for _ in range(8):
        want_word, want_state = py_pcg(int(state))
        got_word, jstate = rng.pcg(jstate)
        assert int(got_word) == want_word
        assert int(jstate) == want_state
        state = np.uint32(want_state)


def test_rand_range():
    seeds = rng.pixel_seed(jnp.arange(64, dtype=jnp.uint32),
                           jnp.zeros(64, jnp.uint32), 3)
    u, _ = rng.rand(seeds)
    u = np.asarray(u)
    assert (u >= 0).all() and (u <= 1).all()
    assert u.std() > 0.1  # not degenerate


def test_pixel_seed_decorrelated():
    px = jnp.arange(1024, dtype=jnp.uint32)
    s0 = np.asarray(rng.pixel_seed(px, px, 0))
    s1 = np.asarray(rng.pixel_seed(px, px, 1))
    assert len(np.unique(s0)) > 1000
    assert (s0 != s1).mean() > 0.99
