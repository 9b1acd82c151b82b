"""Implicit 8-ary (BVH8) acceleration over Morton-ordered leaves.

Round-1 measurement (scripts/kernel_stats.py) showed the binary
skip-walk is bound by per-visit fixed cost (~2100 cycles of loop/cond
machinery vs ~180 of slab math), so the wide tree attacks VISIT COUNT:
one expansion tests all 8 children of a node, cutting inner iterations
~4x at ~2x the per-visit vector work.

Structure (no pointers — fully implicit):
- leaves = the LBVH/SAH builders' K-triangle blocks, Morton order,
  padded to 8^(L-1) with empty boxes;
- level l has 8^l nodes; node (l, i)'s children are (l+1, 8i..8i+8);
- internal records pack the 8 children's boxes: node g (global
  internal id, breadth-first) occupies lanes [(g%16)*8, +8) of row
  g//16, box component c in sublane c -> fetching a child's box is the
  same one-hot reduce as the binary kernel, but ONE row load serves
  all 8 children.

Build is a handful of reshape-reductions — fast enough to rebuild per
frame, and it consumes the existing Accel (same leaf-ordered triangle
pool, so the leaf kernel path is shared).

STATUS: experimental.  Correct (oracle-checked) and at parity with the
binary kernel on small scenes, but the equal-COUNT implicit splits do
not align with Morton bit boundaries, so on large scenes upper-level
child boxes overlap badly and traversal degenerates (measured 25x
slower at 97k tris).  The fix is a Karras-aligned collapse of the
binary tree into explicit 8-wide nodes (child ids fit the spare record
lanes) — ROADMAP item 1; the masked-stack kernel in traversal_wide.py
carries over unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct as flax_struct

from .lbvh import Accel

ARITY = 8


class WideBVH(NamedTuple):
    """records: (R, 8, 128) f32 — packed children boxes of all internal
    nodes, breadth-first (level offsets implicit: (8^l - 1) / 7)."""

    records: jnp.ndarray


@flax_struct.dataclass
class WideAccel:
    base: Accel              # supplies flat.tris (leaf pool) + tree
    wide: WideBVH
    levels: int = flax_struct.field(pytree_node=False, default=2)
    num_leaves: int = flax_struct.field(pytree_node=False, default=0)


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


def build_wide(accel: Accel) -> WideAccel:
    """Build the implicit 8-ary hierarchy from an existing Accel."""
    lmin, lmax = _leaf_boxes(accel)
    nl = lmin.shape[0]
    levels = 1
    while ARITY ** levels < nl:
        levels += 1
    # leaves live at level `levels`; tree has `levels` internal levels 0..levels-1
    nl_pad = ARITY ** levels
    big = jnp.float32(3e38)
    lmin = jnp.concatenate(
        [lmin, jnp.full((nl_pad - nl, 3), big, jnp.float32)])
    lmax = jnp.concatenate(
        [lmax, jnp.full((nl_pad - nl, 3), -big, jnp.float32)])

    # Bottom-up level boxes; per-level child records.
    recs = []  # list of (8^l, 8, 6) child-box blocks for levels 0..levels-1
    cmin, cmax = lmin, lmax
    for lvl in range(levels - 1, -1, -1):
        n = ARITY ** lvl
        block = jnp.concatenate(
            [cmin.reshape(n, ARITY, 3), cmax.reshape(n, ARITY, 3)],
            axis=2)                      # (n, 8, 6)
        recs.append(block)
        cmin = cmin.reshape(n, ARITY, 3).min(axis=1)
        cmax = cmax.reshape(n, ARITY, 3).max(axis=1)
    recs.reverse()                       # level 0 first
    all_nodes = jnp.concatenate(recs, axis=0)  # (NI, 8, 6)

    ni = all_nodes.shape[0]
    ni_pad = ((ni + 15) // 16) * 16
    pad = jnp.zeros((ni_pad - ni, ARITY, 6), jnp.float32)
    pad = pad.at[:, :, 0:3].set(big).at[:, :, 3:6].set(-big)
    all_nodes = jnp.concatenate([all_nodes, pad], axis=0)
    # (NIp, 8, 6) -> rows of 16 nodes: (R, 16, 8, 6) -> (R, 6, 16*8)
    r = ni_pad // 16
    packed = all_nodes.reshape(r, 16, ARITY, 6).transpose(0, 3, 1, 2)
    packed = packed.reshape(r, 6, 128)
    packed = jnp.concatenate(
        [packed, jnp.zeros((r, 2, 128), jnp.float32)], axis=1)
    return WideAccel(base=accel, wide=WideBVH(records=packed),
                     levels=levels, num_leaves=nl)


def level_offset(lvl: int) -> int:
    """Breadth-first global id of the first node at internal level lvl."""
    return (ARITY ** lvl - 1) // (ARITY - 1)
