"""Wavefront ray-batch utilities: coherence ordering.

The reference relies on the GPU scheduler to keep SIMT warps coherent
(H3 in SURVEY.md); on TPU the packet kernel's efficiency is set by how
similar the rays inside a tile are.  These helpers reorder flat ray
batches so each traversal tile sees a compact pixel block (primary
rays) or a direction-coherent cluster (bounce rays).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def to_blocks(x: jnp.ndarray, h: int, w: int, bh: int, bw: int):
    """Reorder a flat (h*w, ...) per-pixel array into (bh, bw) pixel
    blocks using only reshape/transpose (no gather — free on TPU)."""
    tail = x.shape[1:]
    x = x.reshape((h // bh, bh, w // bw, bw) + tail)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h * w,) + tail)


def from_blocks(x: jnp.ndarray, h: int, w: int, bh: int, bw: int):
    """Inverse of to_blocks."""
    tail = x.shape[1:]
    x = x.reshape((h // bh, w // bw, bh, bw) + tail)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h * w,) + tail)


def walk_block_geometry(tile_rows: int, walks: int):
    """Pixel geometry for the per-walk nested ordering: each WALK (a
    (tile_rows, 128)-lane register tile = tile_rows*128 rays) owns a
    compact (ph, pw) pixel block, and the walks of one kernel block
    tile a (gh*ph, gw*pw) screen region.  Returns (ph, pw, gh, gw), or
    None when no square-ish mapping exists.

    Small square walk blocks are what make independent walks pay off:
    a 32x32 block's frustum intersects ~2-3x fewer BVH leaves than the
    8x128 strip the plain (8,128) layout would give the same rays."""
    rays = tile_rows * 128
    ph = 1
    while ph * ph < rays:
        ph *= 2
    pw = rays // ph                       # ph x pw, pw >= ph, both pow2
    if ph * pw != rays:
        return None
    # Arrange the walks of a block in a near-square gh x gw grid.
    gh = 1
    while gh * gh < walks:
        gh *= 2
    gw = walks // gh
    if gh * gw != walks:
        return None
    return ph, pw, gh, gw


def to_walk_blocks(x: jnp.ndarray, h: int, w: int, ph: int, pw: int,
                   gh: int, gw: int):
    """Nested pixel-block reorder: consecutive ph*pw rays form a
    (ph, pw) pixel block (one traversal WALK), and consecutive gh*gw
    such blocks tile a (gh*ph, gw*pw) region (one kernel grid block).
    Pure reshape/transpose — free on TPU."""
    tail = x.shape[1:]
    H1, W1 = gh * ph, gw * pw
    x = x.reshape((h // H1, gh, ph, w // W1, gw, pw) + tail)
    x = x.transpose((0, 3, 1, 4, 2, 5) + tuple(range(6, 6 + len(tail))))
    return x.reshape((h * w,) + tail)


def from_walk_blocks(x: jnp.ndarray, h: int, w: int, ph: int, pw: int,
                     gh: int, gw: int):
    """Inverse of to_walk_blocks."""
    tail = x.shape[1:]
    H1, W1 = gh * ph, gw * pw
    x = x.reshape((h // H1, w // W1, gh, gw, ph, pw) + tail)
    x = x.transpose((0, 2, 4, 1, 3, 5) + tuple(range(6, 6 + len(tail))))
    return x.reshape((h * w,) + tail)




def walk_block_pixels(h: int, w: int, ph: int, pw: int, gh: int,
                      gw: int, dtype=jnp.uint32):
    """(px, py) pixel-coordinate planes of the to_walk_blocks order,
    computed ANALYTICALLY from the linear index — pure elementwise
    integer ops that fuse into the ray-generation program, replacing
    the materialized 6-D transpose of the index planes (measured
    0.146 ms/frame at 512x384)."""
    H1, W1 = gh * ph, gw * pw
    i = jnp.arange(h * w, dtype=jnp.uint32)
    b5 = i % pw
    i = i // pw
    b2 = i % ph
    i = i // ph
    b4 = i % gw
    i = i // gw
    b1 = i % gh
    i = i // gh
    b3 = i % (w // W1)
    b0 = i // (w // W1)
    py = b0 * H1 + b1 * ph + b2
    px = b3 * W1 + b4 * pw + b5
    return px.astype(dtype), py.astype(dtype)


def block_pixels(h: int, w: int, bh: int, bw: int, dtype=jnp.uint32):
    """(px, py) planes of the to_blocks order (see walk_block_pixels)."""
    i = jnp.arange(h * w, dtype=jnp.uint32)
    b3 = i % bw
    i = i // bw
    b1 = i % bh
    i = i // bh
    b2 = i % (w // bw)
    b0 = i // (w // bw)
    py = b0 * bh + b1
    px = b2 * bw + b3
    return px.astype(dtype), py.astype(dtype)


def direction_order_key(d: jnp.ndarray) -> jnp.ndarray:
    """Sort key clustering rays by direction octant then dominant-axis
    value — cheap coherence for bounce/shadow batches."""
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    octant = ((dx > 0).astype(jnp.int32)
              | ((dy > 0).astype(jnp.int32) << 1)
              | ((dz > 0).astype(jnp.int32) << 2))
    # secondary key: quantized polar angle of the dominant axes
    return octant.astype(jnp.float32) * 16.0 + (dy * 4.0 + dz)


def direction_order_key_p(d) -> jnp.ndarray:
    """Planar direction_order_key (d is a V3 of planes, ops/v3.py)."""
    octant = ((d.x > 0).astype(jnp.int32)
              | ((d.y > 0).astype(jnp.int32) << 1)
              | ((d.z > 0).astype(jnp.int32) << 2))
    return octant.astype(jnp.float32) * 16.0 + (d.y * 4.0 + d.z)


def bounce_sort_key_p(o, d) -> jnp.ndarray:
    """Bounce-ray coherence key: 6-D Morton over (origin, direction) —
    8 position bits + 2 direction bits per axis, bit-plane interleaved
    MSB-first (30-bit u32).

    The wide8 kernel's cost is per-GROUP: a (8, 128) group pays node
    expansions and leaf Moller for the union of its rays' footprints.
    Round-5 A/B on the 1080p sorted-bounce distribution
    (scripts/sortkey_ab.py, device ms best-of-3): 10-bit origin Morton
    | octant (the round-3 key) 35.67; direction-major 33.15; 6-D
    Morton p8d2 **28.34** (visits/tile 54.2 -> 46.3, leaf-child
    visits 121.7 -> 102.8).  Coarser 8-bit position quantization
    merges nearby origins so the 6 direction bits cluster ray cones
    within each cell; FINER direction (4-5 bits/axis) fragments
    origin locality and loses 1.6x.  Origins still cluster the
    subsequent light-major shadow segments too."""
    lo = jnp.stack([jnp.min(o.x), jnp.min(o.y), jnp.min(o.z)])
    hi = jnp.stack([jnp.max(o.x), jnp.max(o.y), jnp.max(o.z)])
    extent = jnp.maximum(hi - lo, 1e-9)
    PB, DB = 8, 2
    qp = lambda c, i: jnp.minimum(
        (jnp.clip((c - lo[i]) / extent[i], 0.0, 1.0 - 1e-7)
         * (1 << PB)).astype(jnp.uint32), (1 << PB) - 1)
    qd = lambda c: jnp.minimum(
        (jnp.clip((c + 1.0) * 0.5, 0.0, 1.0 - 1e-7)
         * (1 << DB)).astype(jnp.uint32), (1 << DB) - 1)
    chans = [(qp(o.x, 0), PB), (qp(o.y, 1), PB), (qp(o.z, 2), PB),
             (qd(d.x), DB), (qd(d.y), DB), (qd(d.z), DB)]
    out = jnp.zeros(o.x.shape, jnp.uint32)
    for level in range(PB - 1, -1, -1):
        for v, b in chans:
            if level < b:
                out = ((out << jnp.uint32(1))
                       | ((v >> jnp.uint32(level)) & 1))
    return out




