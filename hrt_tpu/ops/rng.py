"""Counter-based RNG matching the reference shaders bit-for-bit.

The reference seeds per pixel with an xxHash32-style 3D hash of
(pixel.x, pixel.y, frame) and then draws uniforms from a PCG32 stream
(ref: shaders/random.slang:2-30, seeded at shaders/raytracing.slang:96).
Implemented here on jnp uint32 so the sequence is bit-exact and fully
vectorized; helpers return the advanced state functionally (no inout).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
# xxHash32 primes (ref: shaders/random.slang:3).  numpy scalars, not
# jnp arrays: module import must not initialize the XLA backend (farm
# workers call jax.distributed.initialize after importing hrt_tpu).
_PRIME1 = np.uint32(2246822519)
_PRIME2 = np.uint32(3266489917)
_PRIME3 = np.uint32(668265263)
_PRIME4 = np.uint32(374761393)


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << _U32(r)) | (x >> _U32(32 - r))


def hash3(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """xxHash32-style hash of a uint3 (ref: shaders/random.slang:2-12).

    Matches `hash(uint3(p))`: p.x=x, p.y=y, p.z=z.
    """
    x = x.astype(_U32)
    y = y.astype(_U32)
    z = z.astype(_U32)
    h = z + _PRIME4 + x * _PRIME2
    h = _PRIME3 * _rotl(h, 17)
    h = h + y * _PRIME2
    h = _PRIME3 * _rotl(h, 17)
    h = _PRIME1 * (h ^ (h >> _U32(15)))
    h = _PRIME2 * (h ^ (h >> _U32(13)))
    return h ^ (h >> _U32(16))


def pcg(state: jnp.ndarray):
    """One PCG32 step (ref: shaders/random.slang:14-19).

    Returns (word, new_state).  Note the reference's quirk of returning
    the *previous* state's output word while storing `prev` as the new
    state — reproduced exactly.
    """
    state = state.astype(_U32)
    prev = state * _U32(747796405) + _U32(2891336453)
    word = ((prev >> ((prev >> _U32(28)) + _U32(4))) ^ prev) * _U32(277803737)
    return (word >> _U32(22)) ^ word, prev


def rand(state: jnp.ndarray):
    """Uniform float in [0, 1] + new state (ref: shaders/random.slang:21-24)."""
    word, state = pcg(state)
    return word.astype(jnp.float32) * jnp.float32(1.0 / 4294967295.0), state


def rand2(state: jnp.ndarray):
    """Two uniforms + new state (common `float2(rand(s), rand(s))` idiom)."""
    u0, state = rand(state)
    u1, state = rand(state)
    return u0, u1, state


def pixel_seed(px: jnp.ndarray, py: jnp.ndarray, frame) -> jnp.ndarray:
    """Per-pixel seed: hash(uint3(pixel.xy, frame))
    (ref: shaders/raytracing.slang:96)."""
    frame = jnp.asarray(frame, _U32)
    return hash3(px, py, jnp.broadcast_to(frame, jnp.shape(px)))
