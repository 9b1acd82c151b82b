"""LBVH build, entirely on device (jit-compatible).

Replaces the driver-side BLAS/TLAS build the reference calls at
Scene.cpp:256-311 (PREFER_FAST_TRACE) and implements the `prepareRendering`
LBVH the reference stubs out (Scene.cpp:135-138).  Pipeline:

  1. triangle centroids + AABBs           (vector math)
  2. 30-bit Morton codes                  (ops/morton.py)
  3. sort by code                         (jnp.argsort -> XLA sort)
  4. cluster K consecutive tris per leaf  (contiguous leaf blocks)
  5. Karras-2012 radix-tree emit          (branch-free, all-nodes-parallel)
  6. AABB refit                           (fixed-depth bottom-up sweeps)

Leaves are K consecutive triangles of the sorted order, so the
traversal kernel reads contiguous SoA blocks — no per-triangle gathers
(the TPU equivalent of the RT cores' cache-friendly leaf layout).

Child encoding: child >= 0 -> internal node id; child < 0 -> leaf id
-(child+1), covering triangles [leaf*K, (leaf+1)*K).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as flax_struct

from ..models.scene import SceneData
from . import morton

I32 = jnp.int32
_REFIT_DEPTH = 64  # radix tree depth bound: 30 morton bits + index tiebreak


class BVH(NamedTuple):
    """Flat two-children BVH + leaf-reordered triangle pool."""

    child_l: jnp.ndarray   # (Ni,) i32
    child_r: jnp.ndarray   # (Ni,) i32
    bmin_l: jnp.ndarray    # (Ni, 3) f32 — left child AABB
    bmax_l: jnp.ndarray    # (Ni, 3)
    bmin_r: jnp.ndarray    # (Ni, 3)
    bmax_r: jnp.ndarray    # (Ni, 3)
    tri_v0: jnp.ndarray    # (T, 3) leaf-ordered
    tri_e1: jnp.ndarray    # (T, 3)
    tri_e2: jnp.ndarray    # (T, 3)
    tri_perm: jnp.ndarray  # (T,) i32: leaf-ordered -> original triangle id

    @property
    def num_internal(self) -> int:
        return self.child_l.shape[0]


class FlatBVH(NamedTuple):
    """Skip-link (threaded) BVH in DFS preorder, laid out for the Pallas
    packet kernel: node i lives in lane i%128 of row i//128, with its 8
    record values in the sublane dimension — ONE row load + ONE dynamic
    lane-roll fetches a whole node (no gathers, no cross-lane reduces).

    nodes: (Mp//128, 8, 128) f32 — sublanes 0:6 = bminx..bmaxz;
           sublane 6 = bitcast i32 leaf_code (0=internal else
           tri_start+1); sublane 7 = bitcast i32 skip index.
    tris:  (Tp//128, 16, 128) f32 — sublanes 0:9 = v0xyz,e1xyz,e2xyz in
           leaf order (K-blocks never straddle a row); 9:16 padding.
    """

    nodes: jnp.ndarray
    tris: jnp.ndarray

    @property
    def num_nodes_padded(self) -> int:
        return self.nodes.shape[0] * 128


@flax_struct.dataclass
class Accel:
    """Both traversal representations: `tree` for the jnp stack machine,
    `flat` for the Pallas packet kernel.  `leaf_size` is static (it
    drives kernel loop bounds); it cannot be derived from shapes when
    the leaf arrays are padded (SAH builder path).

    `attr` is the pre-sorted hit-attribute table (T_sorted, 16+MAT_W):
    shading gathers it directly by the kernel's sorted triangle id —
    no per-ray remap through tri_perm (measured: the remap gather alone
    was 14% of device frame time) and no separate material-row gather.
    Columns: nrm0|nrm1|nrm2 (9), uv0|uv1|uv2 (6), mat_id (1),
    then the full material row (models/materials.MAT_W).

    `w8` is the optional sublane-record BVH8 table (ops/wide8.py) over
    the SAME leaf pool — the one-crossing-per-8-children traversal
    kernel (ops/traversal_wide8.py) uses it when present.  `w8_lb`
    (static) says the leaf pool was reordered so each wide node's leaf
    children are contiguous and the records carry per-node leaf_base —
    the kernel then derives hit-child triangle starts from ONE scalar
    crossing per visit instead of one per hit child."""

    tree: BVH
    flat: FlatBVH
    leaf_size: int = flax_struct.field(pytree_node=False, default=8)
    attr: jnp.ndarray | None = None
    w8: jnp.ndarray | None = None
    w8_lb: bool = flax_struct.field(pytree_node=False, default=False)


# Column where the material row starts inside Accel.attr.
ATTR_MAT = 16


def hit_attr_table(scene: SceneData, tri_perm: jnp.ndarray) -> jnp.ndarray:
    """Build the sorted hit-attribute table (see Accel.attr).

    One O(T) gather at build time replaces three per-ray gathers per
    bounce (tri_perm remap, attribute rows, material rows) — the
    shading-side analogue of the reference's bindless tables
    (ref: shaders/objects.slang:35-58) flattened into a single row."""
    base = jnp.concatenate(
        [scene.nrm0, scene.nrm1, scene.nrm2,
         scene.uv0, scene.uv1, scene.uv2,
         scene.tri_mat[:, None].astype(jnp.float32)], axis=1)  # (T, 16)
    rows = base[tri_perm]
    mat = scene.materials[scene.tri_mat[tri_perm]]
    return jnp.concatenate([rows, mat], axis=1)


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.clz(x.astype(jnp.uint32)).astype(I32)


def _delta_fn(keys: jnp.ndarray):
    """delta(i, j): common-prefix length of augmented keys, -1 out of
    range (Karras 2012 sec. 3; index-XOR tiebreak for duplicates)."""
    n = keys.shape[0]

    def delta(i, j):
        valid = (j >= 0) & (j <= n - 1)
        j_safe = jnp.clip(j, 0, n - 1)
        ki = keys[i]
        kj = keys[j_safe]
        x = ki ^ kj
        d = jnp.where(
            x == 0,
            32 + _clz32((i ^ j_safe).astype(jnp.uint32)),
            _clz32(x),
        )
        return jnp.where(valid, d, -1)

    return delta


def karras_hierarchy(keys: jnp.ndarray):
    """Emit the radix tree over sorted keys: (child_l, child_r), each
    (n-1,) i32 with leaves encoded as -(leaf+1).  Fully parallel over
    internal nodes; binary searches unrolled over descending powers of
    two (branch-free, static trip count)."""
    n = keys.shape[0]
    delta = _delta_fn(keys)
    i = jnp.arange(n - 1, dtype=I32)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(I32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # Range length l: largest l with delta(i, i + l*d) > delta_min.
    l = jnp.zeros_like(i)
    p = 1 << 30
    while p >= 1:
        t = jnp.full_like(i, p)
        cand = l + t
        ok = delta(i, i + cand * d) > delta_min
        l = jnp.where(ok, cand, l)
        p >>= 1
    j = i + l * d
    delta_node = delta(i, j)

    # Split position s: largest s with delta(i, i + s*d) > delta_node.
    s = jnp.zeros_like(i)
    p = 1 << 30
    while p >= 1:
        t = jnp.full_like(i, p)
        cand = s + t
        ok = (cand < l) & (delta(i, i + cand * d) > delta_node)
        s = jnp.where(ok, cand, s)
        p >>= 1
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    left = jnp.where(lo == gamma, -(gamma + 1), gamma)
    right = jnp.where(hi == gamma + 1, -(gamma + 2), gamma + 1)
    return left, right


def refit(child_l, child_r, leaf_min, leaf_max):
    """Bottom-up AABB propagation by fixed-depth sweeps.

    Each sweep recomputes every internal node's box from its children;
    after k sweeps all nodes with subtree height <= k are final.  Depth
    of a Karras radix tree is bounded by the augmented key length, so
    _REFIT_DEPTH sweeps converge for any input.  Returns per-node child
    boxes (bmin_l, bmax_l, bmin_r, bmax_r)."""
    ni = child_l.shape[0]
    leaf_of = lambda c: -(c + 1)

    def child_box(c, agg_min, agg_max):
        is_leaf = c < 0
        lidx = jnp.clip(leaf_of(c), 0, leaf_min.shape[0] - 1)
        nidx = jnp.clip(c, 0, ni - 1)
        bmin = jnp.where(is_leaf[:, None], leaf_min[lidx], agg_min[nidx])
        bmax = jnp.where(is_leaf[:, None], leaf_max[lidx], agg_max[nidx])
        return bmin, bmax

    def sweep(_, carry):
        agg_min, agg_max = carry
        lmin, lmax = child_box(child_l, agg_min, agg_max)
        rmin, rmax = child_box(child_r, agg_min, agg_max)
        return jnp.minimum(lmin, rmin), jnp.maximum(lmax, rmax)

    init = (jnp.full((ni, 3), jnp.inf, jnp.float32),
            jnp.full((ni, 3), -jnp.inf, jnp.float32))
    agg_min, agg_max = jax.lax.fori_loop(0, _REFIT_DEPTH, sweep, init)
    bmin_l, bmax_l = child_box(child_l, agg_min, agg_max)
    bmin_r, bmax_r = child_box(child_r, agg_min, agg_max)
    return bmin_l, bmax_l, bmin_r, bmax_r


def _masked_scatter(dst, idx, val, mask):
    """dst[idx] = val where mask (out-of-bounds drop trick)."""
    oob = dst.shape[0]
    return dst.at[jnp.where(mask, idx, oob)].set(val, mode="drop")


def flatten_bvh(bvh: BVH, leaf_min, leaf_max, leaf_size: int,
) -> FlatBVH:
    """Linearize the Karras tree into DFS preorder with skip links.

    All on device: subtree sizes and preorder positions are computed by
    the same fixed-depth sweep trick as refit() (top-down/bottom-up
    propagation converges within the radix-tree depth bound).  The
    resulting walk visits strictly increasing indices: hit-internal ->
    +1, otherwise -> skip, which is what lets the Pallas kernel stream
    nodes with a single scalar cursor.
    """
    ni = bvh.child_l.shape[0]
    nl = ni + 1
    cl, cr = bvh.child_l, bvh.child_r

    def subtree(sz, c):
        return jnp.where(c < 0, 1, sz[jnp.clip(c, 0, ni - 1)])

    # Bottom-up subtree sizes.
    def size_sweep(_, sz):
        return 1 + subtree(sz, cl) + subtree(sz, cr)

    sz = jax.lax.fori_loop(0, _REFIT_DEPTH, size_sweep,
                           jnp.ones((ni,), I32))

    # Top-down preorder positions (left-first DFS; any order is exact,
    # order only changes how early the walk tightens best_t).
    first, second = cl, cr
    fsize = subtree(sz, first)

    def pre_sweep(_, carry):
        pre_i, pre_l = carry
        fpos = pre_i + 1
        spos = pre_i + 1 + fsize
        new_i = pre_i
        new_l = pre_l
        new_i = _masked_scatter(new_i, jnp.clip(first, 0, ni - 1), fpos,
                                first >= 0)
        new_i = _masked_scatter(new_i, jnp.clip(second, 0, ni - 1), spos,
                                second >= 0)
        new_l = _masked_scatter(new_l, jnp.clip(-(first + 1), 0, nl - 1),
                                fpos, first < 0)
        new_l = _masked_scatter(new_l, jnp.clip(-(second + 1), 0, nl - 1),
                                spos, second < 0)
        return new_i, new_l

    pre_i, pre_l = jax.lax.fori_loop(
        0, _REFIT_DEPTH, pre_sweep,
        (jnp.zeros((ni,), I32), jnp.zeros((nl,), I32)))

    m = ni + nl
    mp = ((m + 127) // 128) * 128
    k = leaf_size

    own_min_i = jnp.minimum(bvh.bmin_l, bvh.bmin_r)
    own_max_i = jnp.maximum(bvh.bmax_l, bvh.bmax_r)

    big = jnp.float32(3e38)
    comps = []
    for axis in range(3):
        arr = jnp.full((mp,), big, jnp.float32)
        arr = arr.at[pre_i].set(own_min_i[:, axis])
        arr = arr.at[pre_l].set(leaf_min[:nl, axis])  # leaf arrays may
        comps.append(arr)                             # be padded (SAH)
    for axis in range(3):
        arr = jnp.full((mp,), -big, jnp.float32)
        arr = arr.at[pre_i].set(own_max_i[:, axis])
        arr = arr.at[pre_l].set(leaf_max[:nl, axis])
        comps.append(arr)

    leaf_code = jnp.zeros((mp,), I32)
    leaf_code = leaf_code.at[pre_l].set(
        jnp.arange(nl, dtype=I32) * k + 1)
    skip = jnp.full((mp,), m, I32)
    skip = skip.at[pre_i].set(pre_i + sz)
    skip = skip.at[pre_l].set(pre_l + 1)
    # i32 meta rides in the f32 record as raw bits (the kernel only
    # ever moves these lanes — roll/slice — before bitcasting back, so
    # no f32 arithmetic can corrupt them).
    comps.append(jax.lax.bitcast_convert_type(leaf_code, jnp.float32))
    comps.append(jax.lax.bitcast_convert_type(skip, jnp.float32))
    # (8, mp) -> (mp//128, 8, 128): node i at [i//128, :, i%128].
    nodes = jnp.stack(comps).reshape(8, mp // 128, 128).transpose(1, 0, 2)

    t = bvh.tri_v0.shape[0]
    tri_comps = jnp.stack([
        bvh.tri_v0[:, 0], bvh.tri_v0[:, 1], bvh.tri_v0[:, 2],
        bvh.tri_e1[:, 0], bvh.tri_e1[:, 1], bvh.tri_e1[:, 2],
        bvh.tri_e2[:, 0], bvh.tri_e2[:, 1], bvh.tri_e2[:, 2],
    ])
    tri_comps = jnp.concatenate(
        [tri_comps, jnp.zeros((7, t), jnp.float32)], axis=0)
    tris = jnp.reshape(tri_comps, (16, t // 128, 128)).transpose(1, 0, 2)
    return FlatBVH(nodes=nodes, tris=tris)


# Octant-ordered tables are built while 8x the node table still fits
# the kernel's VMEM node budget (traversal_pallas.MAX_NODE_F32).
@functools.partial(jax.jit, static_argnames=("leaf_size",))
def _flatten_jit(bvh: BVH, leaf_min, leaf_max, leaf_size: int) -> FlatBVH:
    """Jitted flatten: one XLA program instead of hundreds of eager
    dispatches — through the axon tunnel the eager path measured
    minutes per build, the jitted one milliseconds."""
    return flatten_bvh(bvh, leaf_min, leaf_max, leaf_size)


def flatten_bvh_full(bvh: BVH, leaf_min, leaf_max,
                     leaf_size: int) -> FlatBVH:
    """Jitted flatten entry (name kept from when this also built the
    since-culled octant-ordered table variants)."""
    return _flatten_jit(bvh, jnp.asarray(leaf_min),
                        jnp.asarray(leaf_max), leaf_size)


@functools.partial(jax.jit, static_argnames=("leaf_size",))
def build_bvh(scene: SceneData, leaf_size: int = 8,
              tri_mask: jnp.ndarray | None = None) -> Accel:
    """Full on-device LBVH build over the scene's triangle pool.

    tri_mask (T,) bool optionally restricts the build to a subset (the
    culling pre-pass, ops/culling.py): masked-out triangles get empty
    AABBs and a past-the-end sort key, so they are never visited."""
    v0, e1, e2 = scene.tri_v0, scene.tri_e1, scene.tri_e2
    valid = scene.tri_valid > 0.5
    if tri_mask is not None:
        valid = valid & tri_mask
    t = v0.shape[0]
    assert t % leaf_size == 0 and t // leaf_size >= 2, \
        "triangle pool padding must give >= 2 leaves"

    v1 = v0 + e1
    v2 = v0 + e2
    tmin = jnp.minimum(v0, jnp.minimum(v1, v2))
    tmax = jnp.maximum(v0, jnp.maximum(v1, v2))
    centroid = (tmin + tmax) * 0.5

    big = jnp.float32(3e38)
    vmask = valid[:, None]
    scene_min = jnp.min(jnp.where(vmask, tmin, big), axis=0)
    scene_max = jnp.max(jnp.where(vmask, tmax, -big), axis=0)

    codes = morton.morton_codes(centroid, scene_min, scene_max)
    # Padding sorts to the end (codes are 30-bit, so this is past them).
    codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    codes_sorted = codes[order]

    v0s, e1s, e2s = v0[order], e1[order], e2[order]
    valid_s = valid[order]
    tmin_s, tmax_s = tmin[order], tmax[order]
    # Invalid/culled triangles become degenerate (e=0 -> det=0, no hit):
    # a mixed boundary leaf can then never report them.
    e1s = jnp.where(valid_s[:, None], e1s, 0.0)
    e2s = jnp.where(valid_s[:, None], e2s, 0.0)

    # Leaf AABBs over K-blocks; invalid tris contribute empty boxes.
    n_leaf = t // leaf_size
    lmin = jnp.min(
        jnp.where(valid_s[:, None], tmin_s, big)
        .reshape(n_leaf, leaf_size, 3), axis=1)
    lmax = jnp.max(
        jnp.where(valid_s[:, None], tmax_s, -big)
        .reshape(n_leaf, leaf_size, 3), axis=1)

    # Cluster key: the first code of each block (sorted order preserved).
    leaf_keys = codes_sorted.reshape(n_leaf, leaf_size)[:, 0]

    child_l, child_r = karras_hierarchy(leaf_keys)
    bmin_l, bmax_l, bmin_r, bmax_r = refit(child_l, child_r, lmin, lmax)

    tree = BVH(
        child_l=child_l, child_r=child_r,
        bmin_l=bmin_l, bmax_l=bmax_l, bmin_r=bmin_r, bmax_r=bmax_r,
        tri_v0=v0s, tri_e1=e1s, tri_e2=e2s,
        tri_perm=order.astype(I32),
    )
    return Accel(tree=tree,
                 flat=flatten_bvh_full(tree, lmin, lmax, leaf_size),
                 leaf_size=leaf_size,
                 attr=hit_attr_table(scene, order.astype(I32)))


def build_bvh_sah(scene: SceneData, leaf_size: int = 16,
                  tri_mask=None) -> Accel:
    """High-quality binned-SAH build via the native C++ builder
    (native/sah_bvh.cpp) — the offline PREFER_FAST_TRACE path for
    static scenes.  Host-side build, device-side flatten; falls back to
    the on-device LBVH when the native library is unavailable."""
    from .. import native

    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    valid = np.asarray(scene.tri_valid) > 0.5
    if tri_mask is not None:
        valid = valid & np.asarray(tri_mask)
    res = native.sah_build(v0, e1, e2, valid.astype(np.int32), leaf_size)
    if res is None:
        mask = None if tri_mask is None else jnp.asarray(tri_mask)
        return build_bvh(scene, leaf_size, tri_mask=mask)

    nl = res["leaf_tri"].shape[0]
    # Pad the leaf-ordered triangle pool to a multiple of 128 slots
    # (FlatBVH row layout); padding slots belong to no leaf.
    per_row = 128 // leaf_size if leaf_size <= 128 else 1
    nl_pad = ((nl + per_row - 1) // per_row) * per_row
    slots = np.full((nl_pad * leaf_size,), -1, np.int64)
    slots[: nl * leaf_size] = res["leaf_tri"].reshape(-1)
    empty = slots < 0
    safe = np.where(empty, 0, slots)
    tri_v0 = v0[safe]
    tri_e1 = np.where(empty[:, None], 0.0, e1[safe]).astype(np.float32)
    tri_e2 = np.where(empty[:, None], 0.0, e2[safe]).astype(np.float32)
    tri_perm = safe.astype(np.int32)

    lmin = np.full((nl_pad, 3), np.float32(3e38), np.float32)
    lmax = np.full((nl_pad, 3), np.float32(-3e38), np.float32)
    lmin[:nl] = res["leaf_min"]
    lmax[:nl] = res["leaf_max"]

    tree = BVH(
        child_l=jnp.asarray(res["child_l"]),
        child_r=jnp.asarray(res["child_r"]),
        bmin_l=jnp.asarray(res["bmin_l"]),
        bmax_l=jnp.asarray(res["bmax_l"]),
        bmin_r=jnp.asarray(res["bmin_r"]),
        bmax_r=jnp.asarray(res["bmax_r"]),
        tri_v0=jnp.asarray(tri_v0), tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2), tri_perm=jnp.asarray(tri_perm),
    )
    flat = flatten_bvh_full(tree, jnp.asarray(lmin), jnp.asarray(lmax),
                            leaf_size)
    accel = Accel(tree=tree, flat=flat, leaf_size=leaf_size,
                  attr=hit_attr_table(scene, jnp.asarray(tri_perm)))
    return attach_wide8(accel, lmin, lmax)


@functools.partial(jax.jit, static_argnames=("leaf_size",))
def _apply_leaf_reorder(tree: BVH, leaf_min, leaf_max, old_of_new,
                        leaf_size: int):
    """Permute the leaf pool by `old_of_new` (new block b holds old
    block old_of_new[b]) and renumber the tree's leaf children to
    match — topology and boxes are untouched, only leaf IDs move."""
    nl_pool = leaf_min.shape[0]
    new_pos = jnp.zeros((nl_pool,), I32).at[old_of_new].set(
        jnp.arange(nl_pool, dtype=I32))

    def blk(a):
        return a.reshape(nl_pool, leaf_size, *a.shape[1:])[
            old_of_new].reshape(a.shape)

    def remap(c):
        leaf = jnp.clip(-(c + 1), 0, nl_pool - 1)
        return jnp.where(c < 0, -(new_pos[leaf] + 1), c)

    tree2 = tree._replace(
        child_l=remap(tree.child_l), child_r=remap(tree.child_r),
        tri_v0=blk(tree.tri_v0), tri_e1=blk(tree.tri_e1),
        tri_e2=blk(tree.tri_e2), tri_perm=blk(tree.tri_perm))
    return tree2, leaf_min[old_of_new], leaf_max[old_of_new]


def attach_wide8(accel: Accel, leaf_min=None, leaf_max=None) -> Accel:
    """Build + attach the sublane-record BVH8 (host-eager: the wide
    node count is data-dependent).  No-op when disabled or too big.

    Default path reorders the leaf pool so each wide node's leaf
    children are contiguous (wide8._assemble reorder) — the whole accel
    (tree leaf ids, flat table, attr rows) is permuted to match, so the
    classic fallback kernel and shading stay exact on the same accel."""
    import os

    if not bool(int(os.environ.get("HRT_WIDE8_BUILD", "1"))):
        return accel
    from . import wide8

    if leaf_min is None:
        from .wide import _leaf_boxes

        leaf_min, leaf_max = _leaf_boxes(accel)
    leaf_min = jnp.asarray(leaf_min)
    leaf_max = jnp.asarray(leaf_max)
    out = wide8.build_wide8(accel.tree, leaf_min, leaf_max,
                            accel.leaf_size, reorder=True)
    if out is None:
        return accel
    if not isinstance(out, tuple):       # overflow fallback: no reorder
        return accel.replace(w8=out)
    rec, old_of_new = out
    tree2, lmin2, lmax2 = _apply_leaf_reorder(
        accel.tree, leaf_min, leaf_max, old_of_new, accel.leaf_size)
    flat2 = flatten_bvh_full(tree2, lmin2, lmax2, accel.leaf_size)
    attr2 = accel.attr
    if attr2 is not None:
        nl_pool = lmin2.shape[0]
        attr2 = attr2.reshape(nl_pool, accel.leaf_size,
                              attr2.shape[-1])[old_of_new].reshape(
                                  attr2.shape)
    return accel.replace(tree=tree2, flat=flat2, attr=attr2, w8=rec,
                         w8_lb=True)
