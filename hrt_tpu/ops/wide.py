"""Shared wide-BVH collapse helpers (consumed by ops/wide8.py).

History: rounds 1-2 carried a full alternative wide-BVH stack here
(implicit 8-ary tree + Karras-aligned collapse + a masked-stack
traversal kernel in traversal_wide.py).  It was exact on TPU but
measured ~1.5x SLOWER than the binary packet kernel (the masked stack
paid more per-visit machinery than the skip-link walk saved in
visits), and round 3's sublane-record BVH8 (ops/wide8.py +
ops/traversal_wide8.py) won both passes outright — so the losing stack
was culled per the round-2 verdict.  What remains is the collapse
primitive both builders shared and the leaf-AABB helper.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .lbvh import Accel

ARITY = 8


def _leaf_boxes(accel: Accel):
    """Recompute per-leaf AABBs from the leaf-ordered triangle pool
    (degenerate padding triangles contribute empty boxes)."""
    k = accel.leaf_size
    v0 = accel.tree.tri_v0
    v1 = v0 + accel.tree.tri_e1
    v2 = v0 + accel.tree.tri_e2
    degen = (jnp.sum(accel.tree.tri_e1 ** 2, -1)
             + jnp.sum(accel.tree.tri_e2 ** 2, -1)) <= 0.0
    big = jnp.float32(3e38)
    tmin = jnp.minimum(v0, jnp.minimum(v1, v2))
    tmax = jnp.maximum(v0, jnp.maximum(v1, v2))
    tmin = jnp.where(degen[:, None], big, tmin)
    tmax = jnp.where(degen[:, None], -big, tmax)
    nl = v0.shape[0] // k
    return (tmin.reshape(nl, k, 3).min(axis=1),
            tmax.reshape(nl, k, 3).max(axis=1))


def _cut(child_l, child_r, depth: int):
    """For every binary internal node: its depth-`depth` cut (2^depth
    entries of binary-node encoding: >=0 internal id, <0 leaf, EMPTY
    sentinel).  The core of the binary -> wide collapse (Karras-aligned:
    wide nodes sit on binary nodes, so SAH quality carries over)."""
    ni = child_l.shape[0]
    EMPTY = jnp.int32(-(2 ** 30))

    def expand(entries):
        # entries: (Ni, k) -> (Ni, 2k)
        is_int = entries >= 0
        safe = jnp.clip(entries, 0, ni - 1)
        left = jnp.where(is_int, child_l[safe], entries)
        right = jnp.where(is_int, child_r[safe], EMPTY)
        return jnp.stack([left, right], axis=-1).reshape(
            entries.shape[0], -1)

    cut = jnp.stack([child_l, child_r], axis=1)        # (Ni, 2)
    for _ in range(depth - 1):
        cut = expand(cut)
    return cut, EMPTY
