"""Sublane-record BVH8: the one-crossing-per-8-children traversal tree.

Round-2 measurement (ROADMAP "ROUND-3 ATTACK PLAN"): every kernel
variant that pays >= 1 vector->scalar transfer per 1-2 node decisions
lands at parity — the transfers occupy the in-order scalar pipeline
~0.4-0.9 us each and do not overlap.  The only record shape that can
win by that model is one where a SINGLE row fetch + a SINGLE dynamic
lane roll exposes ALL 8 children of a node as sublane-parallel values,
so one packed crossing decides 8 subtrees at once.

Record layout (records: (R, 8, 128) i32, 16 nodes per row — i32 so the
TPU's f32 NaN-payload canonicalization can't corrupt the metadata;
box lanes are f32 bitcast to i32):
  node q of row r occupies lanes [8q, 8q+8); SUBLANE j = child slot j;
  lane offset c within the node:
    c in 0..5  : child AABB (bminx, bminy, bminz, bmaxx, bmaxy, bmaxz)
    c == 6     : per-child meta, i32 bits:
                   0            empty slot
                   > 0          leaf child, value = tri_start + 1
                   < 0          internal child, value = -(rank + 1)
                                (rank among the node's internal
                                 children, slot order)
    c == 7     : sublane 0: first-internal-child wide id ("base", i32
                 bits) — internal child with rank r has id base+r;
                 sublane 1: leaf_base << 8 (tri_start of the node's
                 FIRST leaf child; slots are leaf-first and the leaf
                 pool is reordered so the j-th leaf child starts at
                 leaf_base + j*K — one scalar crossing recovers every
                 hit child's start).  Zero when built without reorder.

After `pltpu.roll(rec, (16 - q%16) % 16 * 8, axis=2)` the node sits at
lanes 0..8: every per-child quantity is a FREE static slice shaped
(1, 8, 1) — no masked reduces, no per-child extraction.

Ids are BFS with children-of-a-node CONTIGUOUS (sorted by
(depth, parent_id, slot)), which is what lets the traversal stack
carry one (base, rank_hit_mask) entry per visited node instead of one
id per child.

The collapse consumes the binary Karras/SAH tree (same leaf-ordered
triangle pool as FlatBVH — the leaf kernel path is shared) and is the
TPU counterpart of the driver-side BVH the reference invokes at
Graphics/RayTracing/Scene.cpp:256-311 / raytracing.slang:121.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lbvh import BVH
from .wide import _cut

I32 = jnp.int32
ARITY = 8
NODES_PER_ROW = 128 // ARITY          # 16
MAX_WIDE_NODES = 1 << 15              # crossing packs base into 15 bits
_SWEEPS = 24                          # >= max wide depth (binary/3)


def _flags_and_ids(child_l, child_r):
    """Which binary nodes become wide nodes, plus their BFS ids.

    Returns (flags (Ni,) bool, ids (Ni,) i32 valid where flagged,
    cuts (Ni, 8), EMPTY sentinel).

    Slots are LEAF-FIRST within each node (stable): leaf children at
    slots 0..nleaf-1, internal after, empties last.  With the leaf-pool
    reorder (build_wide8 reorder=True) the j-th leaf child's triangle
    block is leaf_base + j*K — the traversal kernel recovers every hit
    child's start from ONE per-visit scalar (leaf_base) instead of one
    vector->scalar crossing per hit child (the round-3 measured wall:
    ~0.5-0.75 us per crossing, serialized)."""
    ni = child_l.shape[0]
    cuts, EMPTY = _cut(child_l, child_r, 3)            # (Ni, 8)
    is_leaf0 = (cuts < 0) & (cuts != EMPTY)
    cls = jnp.where(is_leaf0, 0, jnp.where(cuts >= 0, 8, 16))
    slot_key = cls + jnp.arange(ARITY, dtype=I32)[None]
    cuts = jnp.take_along_axis(cuts, jnp.argsort(slot_key, axis=1),
                               axis=1)
    is_int = cuts >= 0
    safe_int = jnp.clip(cuts, 0, ni - 1)

    flags = jnp.zeros((ni,), bool).at[0].set(True)

    def fsweep(_, flags):
        src = flags[:, None] & is_int
        return flags.at[jnp.where(src, safe_int, ni)].set(
            True, mode="drop")

    flags = jax.lax.fori_loop(0, _SWEEPS, fsweep, flags)

    # Wide depth (root 0), fixed-point top-down.
    big_d = jnp.int32(1 << 20)
    depth = jnp.full((ni,), big_d, I32).at[0].set(0)

    def dsweep(_, depth):
        src = flags[:, None] & is_int & (depth[:, None] < big_d)
        return depth.at[jnp.where(src, safe_int, ni)].min(
            jnp.broadcast_to(depth[:, None] + 1, cuts.shape),
            mode="drop")

    depth = jax.lax.fori_loop(0, _SWEEPS, dsweep, depth)

    # Parent binary-id and slot of every wide node (root: 0, 0).
    slot_iota = jnp.broadcast_to(jnp.arange(ARITY, dtype=I32)[None],
                                 cuts.shape)
    self_iota = jnp.broadcast_to(jnp.arange(ni, dtype=I32)[:, None],
                                 cuts.shape)
    src = flags[:, None] & is_int
    parent = jnp.zeros((ni,), I32).at[
        jnp.where(src, safe_int, ni)].set(self_iota, mode="drop")
    slot = jnp.zeros((ni,), I32).at[
        jnp.where(src, safe_int, ni)].set(slot_iota, mode="drop")

    # BFS ids: rank by (depth, parent_id, slot); parent ids converge
    # top-down, one level per sweep.
    ids = jnp.zeros((ni,), I32)
    huge = jnp.int32(2 ** 30)

    def isweep(_, ids):
        key = depth * (ARITY * ni) + ids[parent] * ARITY + slot
        key = jnp.where(flags, key, huge)
        order = jnp.argsort(key)
        return jnp.zeros((ni,), I32).at[order].set(
            jnp.arange(ni, dtype=I32))

    ids = jax.lax.fori_loop(0, _SWEEPS, isweep, ids)
    return flags, ids, cuts, EMPTY


@jax.jit
def _count_wide(child_l, child_r):
    """Wide-node count (jitted: the eager fixed-point sweeps would cost
    hundreds of dispatches through the axon tunnel)."""
    flags, _, _, _ = _flags_and_ids(child_l, child_r)
    return jnp.sum(flags.astype(I32))


@functools.partial(jax.jit,
                   static_argnames=("leaf_size", "nw_pad", "reorder"))
def _assemble(tree: BVH, leaf_min, leaf_max, leaf_size: int,
              nw_pad: int, leaf_vals=None, reorder: bool = False):
    """leaf_vals: optional (NL,) i32 of per-sorted-leaf meta payloads
    (meta = leaf_vals[leaf] + 1).  Default: tri_start = leaf*leaf_size.
    The TLAS build passes ORIGINAL instance ids here (ops/tlas.py).

    reorder=True additionally computes the LEAF-POOL PERMUTATION that
    groups each wide node's direct leaf children contiguously (in slot
    order — slots are already leaf-first): metas/leaf_base are emitted
    against the NEW positions and `old_of_new` (NL,) is returned so the
    caller can permute the triangle pool to match (lbvh.attach_wide8).
    Unreferenced pool blocks (SAH padding) keep their relative order at
    the end."""
    ni = tree.child_l.shape[0]
    nl = ni + 1
    flags, ids, cuts, EMPTY = _flags_and_ids(tree.child_l, tree.child_r)
    is_int = cuts >= 0
    is_leaf = (cuts < 0) & (cuts != EMPTY)
    safe_int = jnp.clip(cuts, 0, ni - 1)
    nl_pool = leaf_min.shape[0]
    leaf_of = jnp.clip(-(cuts + 1), 0, nl_pool - 1)
    big = jnp.float32(3e38)

    old_of_new = None
    if reorder:
        slot_iota8 = jnp.arange(ARITY, dtype=I32)[None]
        ref = flags[:, None] & is_leaf
        entry_key = ids[:, None] * ARITY + slot_iota8
        key = jnp.full((nl_pool,), -1, I32).at[
            jnp.where(ref, leaf_of, nl_pool)].set(entry_key, mode="drop")
        key = jnp.where(key >= 0, key,
                        jnp.int32(1 << 28) + jnp.arange(nl_pool,
                                                        dtype=I32))
        old_of_new = jnp.argsort(key).astype(I32)
        new_pos = jnp.zeros((nl_pool,), I32).at[old_of_new].set(
            jnp.arange(nl_pool, dtype=I32))

    # Per-entry boxes: internal -> binary node's own box, leaf -> leaf
    # AABB, empty -> point at infinity (never hit: entry t 3e38).
    own_min = jnp.minimum(tree.bmin_l, tree.bmin_r)
    own_max = jnp.maximum(tree.bmax_l, tree.bmax_r)
    ent_min = jnp.where(is_int[..., None], own_min[safe_int],
                        jnp.where(is_leaf[..., None],
                                  leaf_min[leaf_of], big))
    ent_max = jnp.where(is_int[..., None], own_max[safe_int],
                        jnp.where(is_leaf[..., None],
                                  leaf_max[leaf_of], big))
    inv = ent_min[..., 0:1] > ent_max[..., 0:1]  # padding leaves
    ent_min = jnp.where(inv, big, ent_min)
    ent_max = jnp.where(inv, big, ent_max)

    # Per-entry meta + per-node base (see module docstring).
    rank = jnp.cumsum(is_int.astype(I32), axis=1) - is_int.astype(I32)
    if leaf_vals is None:
        if reorder:
            tri_start = new_pos[leaf_of] * leaf_size
        else:
            tri_start = leaf_of * leaf_size
    else:
        tri_start = leaf_vals[leaf_of]
    meta = jnp.where(is_int, -(rank + 1),
                     jnp.where(is_leaf, tri_start + 1, 0))
    child_ids = jnp.where(is_int, ids[safe_int], jnp.int32(2 ** 30))
    base = jnp.min(child_ids, axis=1)
    base = jnp.where(base == 2 ** 30, 0, base)
    # Per-node leaf_base (<< 8, the kernel's packed-crossing layout):
    # slot 0 holds the first leaf child when the node has any (slots
    # are leaf-first); leafless nodes store 0 (never read — the kernel
    # only crosses it when the visit's leaf mask is non-empty).
    if reorder:
        lbase = jnp.where(is_leaf[:, 0], tri_start[:, 0], 0) * 256
    else:
        lbase = jnp.zeros((cuts.shape[0],), I32)

    # Scatter flagged nodes into wide-id order.
    dst = jnp.where(flags, ids, nw_pad)
    vmin = jnp.full((nw_pad, ARITY, 3), big, jnp.float32).at[dst].set(
        ent_min, mode="drop")
    vmax = jnp.full((nw_pad, ARITY, 3), big, jnp.float32).at[dst].set(
        ent_max, mode="drop")
    vmeta = jnp.zeros((nw_pad, ARITY), I32).at[dst].set(meta,
                                                        mode="drop")
    vbase = jnp.zeros((nw_pad,), I32).at[dst].set(base, mode="drop")
    vlb = jnp.zeros((nw_pad,), I32).at[dst].set(lbase, mode="drop")

    # Assemble (R, 8, 128): V[n, slot, c] -> records[n//16, slot,
    # 8*(n%16) + c].  The records array is I32 end-to-end: negative
    # metas are NaN bit patterns as f32 and the TPU canonicalizes NaN
    # payloads in f32 data movement (measured: scatter/transpose turned
    # every meta into 0x7FC00000); i32 ops never touch the bits.  The
    # kernel bitcasts the box lanes back to f32 after its roll.
    bits = lambda f: jax.lax.bitcast_convert_type(f, I32)
    slot8 = jnp.arange(ARITY, dtype=I32)[None]
    base_col = jnp.where(slot8 == 0, vbase[:, None],
                         jnp.where(slot8 == 1, vlb[:, None], 0))
    v = jnp.concatenate(
        [bits(vmin), bits(vmax),
         vmeta[..., None], base_col[..., None]], axis=2)
    r = nw_pad // NODES_PER_ROW
    records = v.reshape(r, NODES_PER_ROW, ARITY, ARITY)
    records = records.transpose(0, 2, 1, 3).reshape(r, ARITY, 128)
    return records, flags, old_of_new


def build_wide8(tree: BVH, leaf_min, leaf_max, leaf_size: int,
                reorder: bool = False):
    """Collapse the binary tree into sublane-record BVH8 form.

    Host-eager: the wide node count is data-dependent (records must be
    shape-compact to stay VMEM-resident), so one device->host sync
    computes it before the jitted assemble.  Returns the (R, 8, 128)
    records array — with reorder=True, (records, old_of_new) where
    old_of_new is the leaf-pool permutation the caller must apply
    (see _assemble) — or None when the tree exceeds the id-packing
    bound (the traversal falls back to the binary packet kernel)."""
    leaf_min = jnp.asarray(leaf_min)
    nl_pool = leaf_min.shape[0]
    if reorder and nl_pool * leaf_size * 256 >= 2 ** 31:
        # leaf_base << 8 would overflow the packed crossing; such pools
        # (> 8.3M tris) exceed MAX_WIDE_NODES anyway in practice.
        reorder = False
    nw = int(_count_wide(tree.child_l, tree.child_r))
    if nw >= MAX_WIDE_NODES:
        return None
    nw_pad = ((nw + NODES_PER_ROW - 1) // NODES_PER_ROW) * NODES_PER_ROW
    records, _, old_of_new = _assemble(
        tree, leaf_min, jnp.asarray(leaf_max), leaf_size, nw_pad,
        reorder=reorder)
    if reorder:
        return records, old_of_new
    return records


# ---------------------------------------------------------------------------
# Two-level support (ops/tlas.py): region globalization + the TLAS-over-
# instances wide tree.  See traversal_tlas8.py for the unified walk.
# ---------------------------------------------------------------------------

def globalize(records, tri_base: int, id_base):
    """Shift a region's leaf metas by `tri_base` and its first-internal-
    child bases by `id_base` (records are (R, 8, 128) i32; meta lives at
    lane c%8==6 on all sublanes, base at c%8==7 sublane 0, leaf_base<<8
    at c%8==7 sublane 1).  Bases of childless nodes (0) shift
    harmlessly: the packed crossings discard the base when the matching
    hit mask is empty."""
    lane = jnp.arange(128, dtype=I32) % ARITY
    sub = jnp.arange(ARITY, dtype=I32)[None, :, None]
    meta_lane = (lane == 6)[None, None, :]
    base_lane = (lane == 7)[None, None, :] & (sub == 0)
    lb_lane = (lane == 7)[None, None, :] & (sub == 1)
    out = jnp.where(meta_lane & (records > 0), records + tri_base,
                    records)
    out = jnp.where(base_lane, out + id_base, out)
    return jnp.where(lb_lane, out + tri_base * 256, out)


def tlas_nw_pad(num_instances: int) -> int:
    """Static wide-node capacity for a TLAS over `num_instances` boxes
    (binary internal count bounds the flagged-node count)."""
    n = max(num_instances, 2)
    return max(NODES_PER_ROW,
               (n - 1 + NODES_PER_ROW - 1) // NODES_PER_ROW
               * NODES_PER_ROW)


@functools.partial(jax.jit, static_argnames=("nw_pad",))
def build_wide8_tlas(inst_bmin, inst_bmax, nw_pad: int):
    """Wide8 records for a TLAS over instance world AABBs.

    Leaf metas carry ORIGINAL instance ids (+1); the record region is
    padded to the static `nw_pad` so per-frame refit (tlas.py) is one
    jitted call with no host sync.  A single-instance scene duplicates
    its box (Karras needs >= 2 leaves; one redundant AABB test)."""
    from . import morton
    from .lbvh import BVH, karras_hierarchy, refit

    i_real = inst_bmin.shape[0]
    if i_real == 1:
        inst_bmin = jnp.concatenate([inst_bmin, inst_bmin])
        inst_bmax = jnp.concatenate([inst_bmax, inst_bmax])
    centroid = (inst_bmin + inst_bmax) * 0.5
    smin = jnp.min(inst_bmin, axis=0)
    smax = jnp.max(inst_bmax, axis=0)
    codes = morton.morton_codes(centroid, smin, smax)
    order = jnp.argsort(codes).astype(I32)
    child_l, child_r = karras_hierarchy(codes[order])
    lmin, lmax = inst_bmin[order], inst_bmax[order]
    boxes = refit(child_l, child_r, lmin, lmax)
    dummy = jnp.zeros((1, 3), jnp.float32)
    tree = BVH(child_l=child_l, child_r=child_r,
               bmin_l=boxes[0], bmax_l=boxes[1],
               bmin_r=boxes[2], bmax_r=boxes[3],
               tri_v0=dummy, tri_e1=dummy, tri_e2=dummy,
               tri_perm=jnp.zeros((1,), I32))
    records, _, _ = _assemble(tree, lmin, lmax, 1, nw_pad,
                              leaf_vals=jnp.minimum(order, i_real - 1))
    return records
