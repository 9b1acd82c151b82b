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

STATUS: experimental, OFF by default on TPU (HRT_WIDE=1 to enable).
Two builders exist: the implicit equal-count tree (poor box quality on
big scenes — splits don't align with Morton bit boundaries) and the
Karras-aligned collapse below (build_wide_collapsed, good trees).
The kernel is EXACT on real v5e (verified round 2: bit-identical hit
sets vs the packet kernel on the bench scene).  The round-1
"MISCOMPILES / all-misses" episode was i32 node metadata carried in
f32 lanes being denormal-flushed by an f32 reduce — fixed by
bitcasting to i32 BEFORE reducing (see traversal_pallas._node_decode
for the same rule).  It remains gated off because it LOSES to the
packet kernel (~1.5x slower on the bench scenes — the masked stack
pays more per-visit machinery than the skip-link walk saves in
visits); re-evaluate on scenes with much higher depth complexity.
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
    nodes, breadth-first (level offsets implicit: (8^l - 1) / 7).
    meta: (R, 1, 128) i32 — per-child metadata for the explicit
    (collapsed) tree, in its OWN integer array: carrying i32 bit
    patterns inside f32 lanes gets them denormal-flushed to zero by
    TPU XLA (discovered the hard way); zeros for the implicit tree."""

    records: jnp.ndarray
    meta: jnp.ndarray


@flax_struct.dataclass
class WideAccel:
    base: Accel              # supplies flat.tris (leaf pool) + tree
    wide: WideBVH
    levels: int = flax_struct.field(pytree_node=False, default=2)
    num_leaves: int = flax_struct.field(pytree_node=False, default=0)
    arity: int = flax_struct.field(pytree_node=False, default=8)


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
    # NOTE: inverted (min > max) "empty" boxes are only safe inside
    # unions — the slab test re-sorts the slabs per ray-direction sign,
    # which turns an inverted box into a valid (huge) one.  Record
    # entries therefore use a point-at-infinity sentinel (big, big),
    # which genuinely never hits (entry 3e38 > any t_max).
    def sanitize(block):
        empty = block[..., 0:1] > block[..., 3:4]
        return jnp.where(empty, big, block)

    recs = []  # list of (8^l, 8, 6) child-box blocks for levels 0..levels-1
    cmin, cmax = lmin, lmax
    for lvl in range(levels - 1, -1, -1):
        n = ARITY ** lvl
        block = jnp.concatenate(
            [cmin.reshape(n, ARITY, 3), cmax.reshape(n, ARITY, 3)],
            axis=2)                      # (n, 8, 6)
        recs.append(sanitize(block))
        cmin = cmin.reshape(n, ARITY, 3).min(axis=1)
        cmax = cmax.reshape(n, ARITY, 3).max(axis=1)
    recs.reverse()                       # level 0 first
    all_nodes = jnp.concatenate(recs, axis=0)  # (NI, 8, 6)

    ni = all_nodes.shape[0]
    ni_pad = ((ni + 15) // 16) * 16
    pad = jnp.full((ni_pad - ni, ARITY, 6), big, jnp.float32)
    all_nodes = jnp.concatenate([all_nodes, pad], axis=0)
    # (NIp, 8, 6) -> rows of 16 nodes: (R, 16, 8, 6) -> (R, 6, 16*8)
    r = ni_pad // 16
    packed = all_nodes.reshape(r, 16, ARITY, 6).transpose(0, 3, 1, 2)
    packed = packed.reshape(r, 6, 128)
    packed = jnp.concatenate(
        [packed, jnp.zeros((r, 2, 128), jnp.float32)], axis=1)
    meta = jnp.zeros((r, 1, 128), jnp.int32)
    return WideAccel(base=accel, wide=WideBVH(records=packed, meta=meta),
                     levels=levels, num_leaves=nl)


def level_offset(lvl: int) -> int:
    """Breadth-first global id of the first node at internal level lvl."""
    return (ARITY ** lvl - 1) // (ARITY - 1)


# ---------------------------------------------------------------------------
# Karras-aligned collapse: explicit 8-wide nodes from the binary tree.
# Child boxes respect the binary builder's (Morton/SAH) splits, so the
# quality pathology of the implicit equal-count tree disappears.
# Record layout matches the implicit one (boxes in sublanes 0..5) plus
# per-child metadata bitcast into sublane 6:
#   meta > 0  -> internal child, value = wide node id
#   meta < 0  -> leaf child, value = -(leaf_id + 1)
#   meta == 0 -> empty slot
# ---------------------------------------------------------------------------

def _cut(child_l, child_r, depth: int):
    """For every binary internal node: its depth-`depth` cut (2^depth
    entries of binary-node encoding: >=0 internal id, <0 leaf, EMPTY
    sentinel)."""
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


def build_wide_collapsed(accel: Accel, arity: int = 8) -> WideAccel:
    """Collapse the binary Karras/SAH tree into explicit wide nodes
    (arity 8, 16, or 32 — a power of two dividing 128)."""
    import math

    depth = int(math.log2(arity))
    assert 2 ** depth == arity and 128 % arity == 0
    tree = accel.tree
    ni = tree.child_l.shape[0]
    cuts, EMPTY = _cut(tree.child_l, tree.child_r, depth)  # (Ni, A)

    # Which binary nodes become wide nodes: root + every internal cut
    # entry of a wide node (fixed point within depth/3 sweeps).
    flags = jnp.zeros((ni,), bool).at[0].set(True)
    is_int = cuts >= 0
    safe_int = jnp.clip(cuts, 0, ni - 1)

    def sweep(_, flags):
        src = flags[:, None] & is_int
        return flags.at[jnp.where(src, safe_int, ni)].set(
            True, mode="drop")

    flags = jax.lax.fori_loop(0, 24, sweep, flags)

    wid = jnp.cumsum(flags.astype(jnp.int32)) - 1       # binary -> wide id
    lmin, lmax = _leaf_boxes(accel)
    nl = lmin.shape[0]

    # Per-entry boxes + metadata.
    own_min = jnp.minimum(tree.bmin_l, tree.bmin_r)     # internal own box
    own_max = jnp.maximum(tree.bmax_l, tree.bmax_r)
    leaf_of = jnp.clip(-(cuts + 1), 0, nl - 1)
    big = jnp.float32(3e38)
    ent_min = jnp.where(
        is_int[..., None], own_min[safe_int],
        jnp.where(((cuts < 0) & (cuts != EMPTY))[..., None],
                  lmin[leaf_of], big))
    ent_max = jnp.where(
        is_int[..., None], own_max[safe_int],
        jnp.where(((cuts < 0) & (cuts != EMPTY))[..., None],
                  lmax[leaf_of], big))  # empty = point at infinity
    # Leaves that are pure padding have inverted boxes: sanitize.
    inv = ent_min[..., 0:1] > ent_max[..., 0:1]
    ent_min = jnp.where(inv, big, ent_min)
    ent_max = jnp.where(inv, big, ent_max)
    meta = jnp.where(is_int, wid[safe_int],
                     jnp.where(cuts == EMPTY, 0, cuts))  # leaf: -(l+1)

    # Compact flagged nodes into wide order (scatter by wid).
    nw = ni  # static upper bound; unflagged rows stay empty
    dst = jnp.where(flags, wid, nw)
    ent_min_w = jnp.full((nw, arity, 3), big, jnp.float32).at[dst].set(
        ent_min, mode="drop")
    ent_max_w = jnp.full((nw, arity, 3), big, jnp.float32).at[dst].set(
        ent_max, mode="drop")
    meta_w = jnp.zeros((nw, arity), jnp.int32).at[dst].set(
        meta, mode="drop")

    # Pack: nodes-per-row = 128 // arity; comp c in sublane c, child j
    # at lane (g % npr) * arity + j.
    npr = 128 // arity
    nw_pad = ((nw + npr - 1) // npr) * npr
    pad = nw_pad - nw
    ent_min_w = jnp.concatenate(
        [ent_min_w, jnp.full((pad, arity, 3), big, jnp.float32)])
    ent_max_w = jnp.concatenate(
        [ent_max_w, jnp.full((pad, arity, 3), big, jnp.float32)])
    meta_w = jnp.concatenate([meta_w, jnp.zeros((pad, arity), jnp.int32)])
    boxes = jnp.concatenate(
        [ent_min_w, ent_max_w,
         jnp.zeros((nw_pad, arity, 2), jnp.float32)], axis=2)
    r = nw_pad // npr
    packed = boxes.reshape(r, npr, arity, 8).transpose(0, 3, 1, 2)
    packed = packed.reshape(r, 8, 128)
    meta = meta_w.reshape(r, 1, 128)
    return WideAccel(base=accel, wide=WideBVH(records=packed, meta=meta),
                     levels=-1, num_leaves=nl,
                     arity=arity)  # levels=-1: explicit mode
