"""Two-level (TLAS over instances -> per-mesh BLAS) packet traversal.

The reference's core scene architecture is a BLAS per mesh plus a TLAS
over transformed instances (ref: Scene.cpp:163-254 — createBottomAS /
createTopAS; traversal by the driver's RT cores).  This is the
TPU-native equivalent for the Pallas packet kernel:

- every BLAS is a skip-link flat BVH built ONCE per mesh in object
  space (lbvh.py); instance transforms never invalidate it;
- the TLAS is a tiny skip-link BVH over instance world AABBs;
- TLAS rows and all BLAS rows are CONCATENATED into one global
  (rows, 8, 128) node table, so the kernel walks both levels with one
  cursor: TLAS leaves carry a NEGATIVE leaf code -(instance+1) that
  re-bases the walk into the instance's BLAS and re-bases the ray tile
  into object space (one 3x4 transform of the whole tile, the
  WorldToObject4x3 of shaders/raytracing.slang:144-145); walking past
  the BLAS end pops back to the TLAS resume point and restores the
  world-space tile (free: the world planes stay live in registers).

Ray directions are left unnormalized in object space, so `t` stays the
world-space ray parameter and closest-hit state never needs
transforming back.  Animated scenes refit the TLAS per frame
(refit_two_level) without touching any BLAS — the instancing win the
flattened world-soup path (models/scene.build) cannot give.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct as flax_struct

from ..models.scene import Scene
from . import lbvh, morton
from .traversal_pallas import (INF, LEAF_UNROLL, MAX_NODE_F32,
                               MAX_VMEM_F32, TILE_LANES, TILE_ROWS,
                               _leaf_fetch, _node_decode, _record_extract,
                               _row_fetcher, _row_fetcher_stream,
                               _slab_test, _moller, _to_tiles, _tri_vecs)
from .twolevel import _mesh_scene_arrays
from .v3 import V3

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


@flax_struct.dataclass
class TwoLevelFlat:
    """Concatenated two-level tables for the packet kernel.

    nodes: (R, 8, 128) — TLAS rows first, then each mesh's BLAS rows.
           Sublane 6 (bitcast i32): 0 = internal, >0 = global sorted
           triangle start + 1, <0 = -(instance + 1).  Sublane 7: skip
           index, already globalized per region.
    tris:  (TR, 16, 128) — per-mesh leaf-ordered pools, concatenated
           (row-aligned, so leaf blocks never straddle rows).
    inst:  (IR, 16, 128) instance records: sublanes 0:12 = 3x4
           obj_from_world (row-major), 12 = blas node base (i32 bits),
           13 = blas walk end (i32 bits), 14:16 pad.
    attr:  (T_global, 15) object-space nrm0|nrm1|nrm2|uv0|uv1|uv2 rows
           in global sorted order (shading gathers + transforms by the
           hit instance's normal matrix).
    """

    nodes: jnp.ndarray
    tris: jnp.ndarray
    inst: jnp.ndarray
    attr: jnp.ndarray
    inst_mat: jnp.ndarray        # (I,) i32 material ids
    inst_mesh: jnp.ndarray       # (I,) i32
    normal_mat: jnp.ndarray      # (I, 3, 3)
    world_from_obj: jnp.ndarray  # (I, 3, 4)
    obj_from_world: jnp.ndarray  # (I, 3, 4)
    blas_base: jnp.ndarray       # (I,) i32 global node index
    blas_end: jnp.ndarray        # (I,) i32
    root_bmin: jnp.ndarray       # (I, 3) object-space BLAS root box
    root_bmax: jnp.ndarray       # (I, 3)
    tlas_m: int = flax_struct.field(pytree_node=False, default=1)
    leaf_size: int = flax_struct.field(pytree_node=False, default=16)
    # Optional sublane-record BVH8 form (ops/wide8.py): one unified
    # (R, 8, 128) i32 table (TLAS region first, instance-id leaves),
    # walked by ops/traversal_tlas8.py.  None -> binary kernel.
    w8_nodes: jnp.ndarray | None = None
    w8_root: jnp.ndarray | None = None     # (I, 1) i32 BLAS root ids
    w8_tlas_nw: int = flax_struct.field(pytree_node=False, default=0)


def _ceil(a: int, b: int) -> int:
    return (a + b - 1) // b * b


def _pack_inst(obj_from_world, blas_base, blas_end):
    """Instance records -> (IR, 16, 128) rows (see TwoLevelFlat.inst)."""
    i = obj_from_world.shape[0]
    ip = _ceil(max(i, 1), 128)
    mat = jnp.zeros((ip, 12), jnp.float32).at[:i].set(
        obj_from_world.reshape(i, 12))
    base = jnp.zeros((ip,), I32).at[:i].set(blas_base)
    end = jnp.zeros((ip,), I32).at[:i].set(blas_end)
    comps = [mat[:, c] for c in range(12)]
    comps.append(jax.lax.bitcast_convert_type(base, jnp.float32))
    comps.append(jax.lax.bitcast_convert_type(end, jnp.float32))
    comps.append(jnp.zeros((ip,), jnp.float32))
    comps.append(jnp.zeros((ip,), jnp.float32))
    return jnp.stack(comps).reshape(16, ip // 128, 128).transpose(1, 0, 2)


def _tlas_nodes(inst_bmin, inst_bmax):
    """Skip-link TLAS over instance world AABBs -> (rows, 8, 128).

    Leaf codes are remapped to -(instance+1).  A single-instance scene
    is padded with a duplicate box (costs one extra AABB test)."""
    i_real = inst_bmin.shape[0]
    if i_real == 1:
        inst_bmin = jnp.concatenate([inst_bmin, inst_bmin])
        inst_bmax = jnp.concatenate([inst_bmax, inst_bmax])
    i = inst_bmin.shape[0]
    centroid = (inst_bmin + inst_bmax) * 0.5
    smin = jnp.min(inst_bmin, axis=0)
    smax = jnp.max(inst_bmax, axis=0)
    codes = morton.morton_codes(centroid, smin, smax)
    order = jnp.argsort(codes).astype(I32)
    child_l, child_r = lbvh.karras_hierarchy(codes[order])
    lmin, lmax = inst_bmin[order], inst_bmax[order]
    boxes = lbvh.refit(child_l, child_r, lmin, lmax)
    dummy = jnp.zeros((128, 3), jnp.float32)
    tree = lbvh.BVH(child_l=child_l, child_r=child_r,
                    bmin_l=boxes[0], bmax_l=boxes[1],
                    bmin_r=boxes[2], bmax_r=boxes[3],
                    tri_v0=dummy, tri_e1=dummy, tri_e2=dummy,
                    tri_perm=jnp.arange(128, dtype=I32))
    flat = lbvh.flatten_bvh(tree, lmin, lmax, leaf_size=1)
    # leaf_code = sorted-leaf + 1 -> -(original instance + 1).
    lc = jax.lax.bitcast_convert_type(flat.nodes[:, 6, :], I32)
    inst_id = jnp.minimum(order, i_real - 1)[
        jnp.clip(lc - 1, 0, i - 1)]
    lc = jnp.where(lc > 0, -(inst_id + 1), 0)
    nodes = flat.nodes.at[:, 6, :].set(
        jax.lax.bitcast_convert_type(lc, jnp.float32))
    return nodes, 2 * i - 1


def build_two_level_flat(scene: Scene, leaf_size: int = 16,
                         sah: bool = True) -> TwoLevelFlat:
    """Per-mesh BLAS + TLAS, concatenated for the unified packet walk
    (host orchestration; per-mesh builds reuse lbvh.build_bvh[_sah])."""
    from ..models.scene import PAD, SceneData

    if not scene.meshes or not scene.instances:
        raise ValueError("scene needs meshes and instances")

    node_tables, tri_tables, attr_tables = [], [], []
    mesh_node_base, mesh_node_end = [], []   # per mesh, in BLAS-local 0
    mesh_tri_base, mesh_root = [], []
    w8_tables = []      # (records_local, tri_base) per mesh, or None
    node_rows = tri_rows = 0
    for mesh in scene.meshes:
        t_pad = max(PAD, _ceil(mesh.num_triangles, PAD))
        arrs = _mesh_scene_arrays(mesh, t_pad)
        fake = SceneData(
            **{k: jnp.asarray(v) for k, v in arrs.items()},
            tri_mat=jnp.zeros((t_pad,), I32),
            tri_inst=jnp.zeros((t_pad,), I32),
            materials=jnp.zeros((1, 1)), lights=jnp.zeros((0, 8)),
            sky=jnp.zeros((22,)),
            inst_bmin=jnp.zeros((1, 3)), inst_bmax=jnp.zeros((1, 3)))
        accel = (lbvh.build_bvh_sah(fake, leaf_size) if sah
                 else lbvh.build_bvh(fake, leaf_size))
        flat, tree = accel.flat, accel.tree
        m_real = 2 * (tree.child_l.shape[0] + 1) - 1

        # Globalize: leaf codes shift by the mesh's triangle base, skip
        # links by its node base (padding rows shift too — harmless,
        # they are unreachable).
        lc = jax.lax.bitcast_convert_type(flat.nodes[:, 6, :], I32)
        lc = jnp.where(lc > 0, lc + tri_rows * 128, lc)
        sk = jax.lax.bitcast_convert_type(flat.nodes[:, 7, :], I32)
        nodes = flat.nodes.at[:, 6, :].set(
            jax.lax.bitcast_convert_type(lc, jnp.float32))
        # node base added later (after TLAS size known) — record raw.
        node_tables.append((nodes, sk))
        tri_tables.append(flat.tris)

        perm = np.asarray(tree.tri_perm)
        base = np.concatenate(
            [arrs[k] for k in ("nrm0", "nrm1", "nrm2",
                               "uv0", "uv1", "uv2")], axis=1)  # (t,15)
        attr_tables.append(base[np.clip(perm, 0, t_pad - 1)])

        # Sublane-record BVH8 form of this BLAS (same leaf pool).
        from .wide import _leaf_boxes as _w_leaf_boxes
        from . import wide8

        if bool(int(__import__("os").environ.get("HRT_WIDE8_BUILD",
                                                 "1"))):
            lmin, lmax = _w_leaf_boxes(accel)
            w8_local = wide8.build_wide8(accel.tree, lmin, lmax,
                                         leaf_size)
        else:
            w8_local = None
        w8_tables.append(None if w8_local is None
                         else (w8_local, tri_rows * 128))

        mesh_node_base.append(node_rows * 128)
        mesh_node_end.append(node_rows * 128 + m_real)
        mesh_tri_base.append(tri_rows * 128)
        mesh_root.append((
            np.minimum(np.asarray(tree.bmin_l[0]),
                       np.asarray(tree.bmin_r[0])),
            np.maximum(np.asarray(tree.bmax_l[0]),
                       np.asarray(tree.bmax_r[0]))))
        node_rows += nodes.shape[0]
        tri_rows += flat.tris.shape[0]

    inst = scene.instances
    i_n = len(inst)
    inst_mesh = np.asarray([x.mesh_id for x in inst], np.int32)
    inst_mat = np.asarray([x.material_id for x in inst], np.int32)
    w_from_o = np.stack([x.transform for x in inst]).astype(np.float32)
    o_from_w = np.stack([x.inverse_transform
                         for x in inst]).astype(np.float32)
    normal_mat = np.stack([x.normal_matrix for x in inst]).astype(
        np.float32)
    root_bmin = np.stack([mesh_root[m][0] for m in inst_mesh])
    root_bmax = np.stack([mesh_root[m][1] for m in inst_mesh])

    # Instance world AABBs from the BLAS root boxes (8 corners).
    bmin, bmax = _world_aabbs(jnp.asarray(root_bmin),
                              jnp.asarray(root_bmax),
                              jnp.asarray(w_from_o))
    tlas, tlas_m = _tlas_nodes(bmin, bmax)
    tlas_rows = tlas.shape[0]

    # Concatenate: TLAS first, then BLAS tables with globalized skips.
    parts = [tlas]
    for (nodes, sk), nb in zip(node_tables, mesh_node_base):
        sk_g = sk + (tlas_rows * 128 + nb)
        parts.append(nodes.at[:, 7, :].set(
            jax.lax.bitcast_convert_type(sk_g, jnp.float32)))
    all_nodes = jnp.concatenate(parts, axis=0)
    all_tris = jnp.concatenate(tri_tables, axis=0)
    all_attr = jnp.asarray(np.concatenate(attr_tables, axis=0))

    blas_base = jnp.asarray(
        tlas_rows * 128 + np.asarray(mesh_node_base)[inst_mesh], I32)
    blas_end = jnp.asarray(
        tlas_rows * 128 + np.asarray(mesh_node_end)[inst_mesh], I32)

    # Unified wide8 table: TLAS region (instance-id leaves) + every
    # mesh's globalized BLAS region (ops/traversal_tlas8.py walks it).
    from . import wide8

    w8_nodes = w8_root = None
    w8_tlas_nw = 0
    if all(w is not None for w in w8_tables):
        tlas_pad = wide8.tlas_nw_pad(i_n)
        mesh_w8_base, acc = [], tlas_pad
        for rec, _ in w8_tables:
            mesh_w8_base.append(acc)
            acc += rec.shape[0] * wide8.NODES_PER_ROW
        if acc < wide8.MAX_WIDE_NODES:
            tlas_rec = wide8.build_wide8_tlas(jnp.asarray(bmin),
                                              jnp.asarray(bmax),
                                              tlas_pad)
            parts_w8 = [tlas_rec] + [
                wide8.globalize(rec, tri_base, base)
                for (rec, tri_base), base in zip(w8_tables,
                                                 mesh_w8_base)]
            w8_nodes = jnp.concatenate(parts_w8, axis=0)
            w8_root = jnp.asarray(
                np.asarray(mesh_w8_base, np.int32)[inst_mesh][:, None])
            w8_tlas_nw = int(tlas_pad)

    return TwoLevelFlat(
        nodes=all_nodes, tris=all_tris,
        inst=_pack_inst(jnp.asarray(o_from_w), blas_base, blas_end),
        attr=all_attr,
        inst_mat=jnp.asarray(inst_mat), inst_mesh=jnp.asarray(inst_mesh),
        normal_mat=jnp.asarray(normal_mat),
        world_from_obj=jnp.asarray(w_from_o),
        obj_from_world=jnp.asarray(o_from_w),
        blas_base=blas_base, blas_end=blas_end,
        root_bmin=jnp.asarray(root_bmin),
        root_bmax=jnp.asarray(root_bmax),
        tlas_m=int(tlas_m), leaf_size=leaf_size,
        w8_nodes=w8_nodes, w8_root=w8_root, w8_tlas_nw=w8_tlas_nw)


def _world_aabbs(root_bmin, root_bmax, world_from_obj):
    """World AABBs of per-instance object boxes (all 8 corners)."""
    sel = jnp.asarray([[x & 1, (x >> 1) & 1, (x >> 2) & 1]
                       for x in range(8)], jnp.float32)       # (8, 3)
    corners = (root_bmin[:, None, :] * (1.0 - sel)
               + root_bmax[:, None, :] * sel)                 # (I, 8, 3)
    wc = (jnp.einsum("iab,ikb->ika", world_from_obj[:, :, :3], corners)
          + world_from_obj[:, None, :, 3])
    return jnp.min(wc, axis=1), jnp.max(wc, axis=1)


@jax.jit
def refit_two_level(tl: TwoLevelFlat, world_from_obj, obj_from_world,
                    normal_mat) -> TwoLevelFlat:
    """Per-frame TLAS refit for animated instances: new transforms ->
    new instance AABBs -> rebuilt TLAS rows + instance records.  No
    BLAS is touched (the reference's UPDATE-mode TLAS rebuild,
    Scene.cpp:176-254 analogue).  Fully jit — runs on device inside the
    frame loop."""
    bmin, bmax = _world_aabbs(tl.root_bmin, tl.root_bmax, world_from_obj)
    tlas, _ = _tlas_nodes(bmin, bmax)
    nodes = jnp.concatenate([tlas, tl.nodes[tlas.shape[0]:]], axis=0)
    w8_nodes = tl.w8_nodes
    if w8_nodes is not None:
        from . import wide8

        tlas8 = wide8.build_wide8_tlas(bmin, bmax, tl.w8_tlas_nw)
        rows8 = tl.w8_tlas_nw // wide8.NODES_PER_ROW
        w8_nodes = jnp.concatenate([tlas8, w8_nodes[rows8:]], axis=0)
    return tl.replace(
        nodes=nodes, w8_nodes=w8_nodes,
        inst=_pack_inst(obj_from_world, tl.blas_base, tl.blas_end),
        world_from_obj=world_from_obj, obj_from_world=obj_from_world,
        normal_mat=normal_mat)


# ---------------------------------------------------------------------------
# The unified two-level packet kernel.
# ---------------------------------------------------------------------------

def _inst_decode(inst_ref, inst_id):
    """Instance record -> (12 matrix (1,1) vecs, blas_base, blas_end)."""
    row = inst_id // TILE_LANES
    lane = inst_id % TILE_LANES
    rec = inst_ref[pl.ds(row, 1)]                     # (1, 16, 128)
    r = _record_extract(rec, lane)                    # (1, 16, 1)
    mat = [r[:, c, :] for c in range(12)]
    mask = jax.lax.broadcasted_iota(I32, (1, 2, TILE_LANES), 2) == lane
    meta = jnp.sum(jnp.where(mask, pltpu.bitcast(rec[:, 12:14, :], I32),
                             0), axis=2, keepdims=True)
    return mat, jnp.sum(meta[:, 0, :]), jnp.sum(meta[:, 1, :])


def _make_tlas_kernel(m_tot: int, tlas_m: int, leaf_size: int,
                      t_min: float, find_closest: bool,
                      tris_in_vmem: bool, nodes_in_vmem: bool):
    rows = TILE_ROWS

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               nodes_ref, tris_ref, inst_ref,
               t_ref, tri_ref, inst_out_ref, u_ref, v_ref, *rest):
        rest = list(rest)
        scratch = [rest.pop(0), rest.pop(0)] if not tris_in_vmem else []
        if not nodes_in_vmem:
            node_buf, node_sems, node_cache = rest
            node_cache[0] = jnp.int32(-1)
            fetch = _row_fetcher_stream(nodes_ref, m_tot, 0, node_buf,
                                        node_sems, node_cache)
        else:
            fetch = _row_fetcher(nodes_ref, m_tot)

        tiny = jnp.float32(1e-20)
        tmin = jnp.float32(t_min)

        def inv(c):
            safe = jnp.where(jnp.abs(c) < tiny,
                             jnp.where(c < 0, -tiny, tiny), c)
            return 1.0 / safe

        # World-space tile planes (kernel-lifetime values): instance
        # exit restores these for free.
        wox, woy, woz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        wdx, wdy, wdz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        wix, wiy, wiz = inv(wdx), inv(wdy), inv(wdz)
        world = (wox * wix, woy * wiy, woz * wiz, wix, wiy, wiz,
                 wox, woy, woz, wdx, wdy, wdz)

        def walk_active(st):
            cur, in_blas, done = st[0], st[3], st[10]
            alive = in_blas | (cur < tlas_m)
            if find_closest:
                return alive
            return alive & jnp.logical_not(done)

        def step(st):
            (cur, resume, bend, in_blas, cinst,
             best_t, best_i, best_inst, bu, bv, done, cray) = st
            oix, oiy, oiz, ix, iy, iz, ox, oy, oz, dx, dy, dz = cray

            box, leaf_v, skip_v = _node_decode(
                fetch(cur), jnp.minimum(cur, m_tot - 1))
            hit = _slab_test(box, oix, oiy, oiz, ix, iy, iz, tmin,
                             best_t)
            # One packed vector->scalar crossing for the whole 3-way
            # decision (see traversal_pallas._node_decode): bits 0-1 =
            # take_leaf / enter_instance, rest = next cursor.
            any_v = jnp.any(hit, axis=(0, 1), keepdims=True)
            is_leaf_v = leaf_v > 0
            is_inst_v = leaf_v < 0
            descend_v = any_v & (leaf_v == 0)
            nxt_v = jnp.where(descend_v, cur + 1, skip_v)
            p = jnp.sum(nxt_v * 4
                        + (any_v & is_leaf_v).astype(I32)
                        + 2 * (any_v & is_inst_v).astype(I32))
            take_leaf = (p & 1) == 1
            enter = (p & 2) == 2
            nxt = p >> 2

            # BLAS triangle leaf: K Moller tests (global sorted ids).
            def do_leaf(args):
                best_t, best_i, best_inst, bu, bv, done = args
                start = jnp.sum(leaf_v) - 1
                lane0 = start % TILE_LANES
                if tris_in_vmem:
                    rec = _leaf_fetch(tris_ref, start)
                else:
                    rec = _leaf_fetch(tris_ref, start, scratch[0],
                                      scratch[1])
                unroll = min(LEAF_UNROLL, leaf_size)
                while leaf_size % unroll:
                    unroll -= 1

                def tri_body(gk, args):
                    best_t, best_i, best_inst, bu, bv = args
                    for kk in range(unroll):
                        k = gk * unroll + kk
                        tri = _tri_vecs(rec, lane0 + k)
                        h, t, u, v = _moller(tri, ox, oy, oz,
                                             dx, dy, dz, tmin, best_t)
                        best_i = jnp.where(h, start + k, best_i)
                        best_inst = jnp.where(h, cinst, best_inst)
                        if find_closest:
                            bu = jnp.where(h, u, bu)
                            bv = jnp.where(h, v, bv)
                            best_t = jnp.where(h, t, best_t)
                    return best_t, best_i, best_inst, bu, bv

                best_t, best_i, best_inst, bu, bv = jax.lax.fori_loop(
                    0, leaf_size // unroll, tri_body,
                    (best_t, best_i, best_inst, bu, bv))
                if not find_closest:
                    occ = best_i >= 0
                    best_t = jnp.where(occ, jnp.float32(-1.0), best_t)
                    done = jnp.all(occ)
                return best_t, best_i, best_inst, bu, bv, done

            best_t, best_i, best_inst, bu, bv, done = jax.lax.cond(
                take_leaf, do_leaf, lambda a: a,
                (best_t, best_i, best_inst, bu, bv, done))

            # TLAS instance leaf: re-base walk + rays into the BLAS.
            def do_enter(_):
                iid = -jnp.sum(leaf_v) - 1
                m, base, end = _inst_decode(inst_ref, iid)
                oo_x = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                oo_y = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                oo_z = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                od_x = m[0] * wdx + m[1] * wdy + m[2] * wdz
                od_y = m[4] * wdx + m[5] * wdy + m[6] * wdz
                od_z = m[8] * wdx + m[9] * wdy + m[10] * wdz
                ix, iy, iz = inv(od_x), inv(od_y), inv(od_z)
                cray = (oo_x * ix, oo_y * iy, oo_z * iz, ix, iy, iz,
                        oo_x, oo_y, oo_z, od_x, od_y, od_z)
                # enter implies not-descend, so nxt == this node's skip
                # — exactly the TLAS resume point after the BLAS.
                return base, end, nxt, iid, cray

            nxt, bend, resume, cinst, cray = jax.lax.cond(
                enter, do_enter, lambda _: (nxt, bend, resume, cinst,
                                            cray), 0)
            in_blas = in_blas | enter

            # BLAS walk exhausted -> pop to the TLAS resume point.
            pop = in_blas & (nxt >= bend)
            cray = jax.lax.cond(pop, lambda _: world,
                                lambda _: cray, 0)
            nxt = jnp.where(pop, resume, nxt)
            in_blas = in_blas & jnp.logical_not(pop)

            return (nxt, resume, bend, in_blas, cinst,
                    best_t, best_i, best_inst, bu, bv, done, cray)

        st = (jnp.int32(0), jnp.int32(tlas_m), jnp.int32(0),
              jnp.zeros((), bool), jnp.int32(0),
              tmax_ref[:, :],
              jnp.full((rows, TILE_LANES), -1, I32),
              jnp.full((rows, TILE_LANES), -1, I32),
              jnp.zeros((rows, TILE_LANES), jnp.float32),
              jnp.zeros((rows, TILE_LANES), jnp.float32),
              jnp.zeros((), bool), world)
        st = jax.lax.while_loop(walk_active, step, st)
        _, _, _, _, _, best_t, best_i, best_inst, bu, bv, _, _ = st
        t_ref[:, :] = best_t
        tri_ref[:, :] = best_i
        inst_out_ref[:, :] = best_inst
        u_ref[:, :] = bu
        v_ref[:, :] = bv

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("m_tot", "tlas_m", "leaf_size",
                                    "t_min", "find_closest"))
def _trace_tiles_tlas(ox, oy, oz, dx, dy, dz, tmax, nodes, tris, inst,
                      m_tot: int, tlas_m: int, leaf_size: int,
                      t_min: float, find_closest: bool):
    rows = ox.shape[0]
    n_tiles = rows // TILE_ROWS
    nodes_in_vmem = nodes.size <= MAX_NODE_F32
    tris_in_vmem = ((nodes.size if nodes_in_vmem else 0)
                    + tris.size) <= MAX_VMEM_F32
    kernel = _make_tlas_kernel(m_tot, tlas_m, leaf_size, t_min,
                               find_closest, tris_in_vmem, nodes_in_vmem)
    ray_spec = pl.BlockSpec((TILE_ROWS, TILE_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch_shapes = [] if tris_in_vmem else [
        pltpu.VMEM((1, 16, TILE_LANES), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if not nodes_in_vmem:
        scratch_shapes += [
            pltpu.VMEM((1, 8, TILE_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SMEM((1,), jnp.int32),
        ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), I32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), I32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, TILE_LANES), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 7 + [
            vmem_spec if nodes_in_vmem else any_spec,
            vmem_spec if tris_in_vmem else any_spec,
            vmem_spec],
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=(jax.default_backend() == "cpu"),
    )(ox, oy, oz, dx, dy, dz, tmax, nodes, tris, inst)


def use_wide8_tlas(tl: TwoLevelFlat) -> bool:
    """Wide two-level kernel when the table exists (mirrors
    traversal_pallas.use_wide8's CPU gating)."""
    import os

    import jax as _jax

    if tl.w8_nodes is None or not bool(int(
            os.environ.get("HRT_WIDE8", "1"))):
        return False
    if (_jax.default_backend() == "cpu"
            and not int(os.environ.get("HRT_WIDE8_CPU", "0"))):
        return False
    return True


def _run_planes(tl: TwoLevelFlat, o: V3, d: V3, t_min, t_max,
                find_closest: bool):
    n = o.x.shape[0]
    quantum = TILE_ROWS * TILE_LANES
    n_pad = _ceil(n, quantum)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    comps = [_to_tiles(o.x, n_pad), _to_tiles(o.y, n_pad),
             _to_tiles(o.z, n_pad), _to_tiles(d.x, n_pad),
             _to_tiles(d.y, n_pad), _to_tiles(d.z, n_pad),
             _to_tiles(tmax, n_pad, fill=-1.0)]
    if use_wide8_tlas(tl):
        from . import traversal_tlas8

        i_n = tl.obj_from_world.shape[0]
        t, tri, inst, u, v, *cnt = traversal_tlas8._trace_tiles_tlas8(
            *comps, tl.w8_nodes, tl.tris,
            tl.obj_from_world.reshape(i_n, 12), tl.w8_root,
            tlas_nw=tl.w8_tlas_nw, leaf_size=tl.leaf_size,
            t_min=float(t_min), find_closest=find_closest)
        if cnt:  # HRT_DEBUG_COUNTERS=1: stash for tlas8_probe.py
            traversal_tlas8.LAST_COUNTERS = cnt[0]
    else:
        t, tri, inst, u, v = _trace_tiles_tlas(
            *comps, tl.nodes, tl.tris, tl.inst,
            m_tot=tl.nodes.shape[0] * 128, tlas_m=tl.tlas_m,
            leaf_size=tl.leaf_size, t_min=float(t_min),
            find_closest=find_closest)
    out = lambda a: a.reshape(-1)[:n]
    return out(t), out(tri), out(inst), out(u), out(v)


def closest_hit_tlas(tl: TwoLevelFlat, o: V3, d: V3, t_min, t_max):
    """(t, tri_global_sorted, inst, u, v) over planar rays."""
    t, tri, inst, u, v = _run_planes(tl, o, d, t_min, t_max, True)
    return t, tri, inst, u, v


def any_hit_tlas(tl: TwoLevelFlat, o: V3, d: V3, t_min, t_max):
    """Occlusion query: bool (N,)."""
    _, tri, _, _, _ = _run_planes(tl, o, d, t_min, t_max, False)
    return tri >= 0


def shade_attrs_tlas(tl: TwoLevelFlat, materials, tri_id, inst_id, u, v):
    """Hit attributes for two-level hits: ONE gather of the global
    sorted attr table, normals transformed by the hit instance's normal
    matrix, material row from the instance's material id
    (ref: rchitMain attribute fetch + InstanceInfo material lookup,
    shaders/objects.slang:15-58).  Returns (normal V3, MatP, mat_rows,
    (tu, tv) interpolated hit UVs)."""
    from ..models.materials import MatP
    from . import v3

    # Each transposed gather materializes as ONE (W, N//128, 128)
    # relayout whose field slices are contiguous (v3.rows_to_planes);
    # the unmaterialized 2-D transpose lowered every field slice as a
    # strided squeeze-reduce — measured 10.7 ms/frame on the
    # 256-instance config (same pathology renderer._shade_attrs_p
    # documents).
    rows = tl.attr[jnp.maximum(tri_id, 0)]            # (N, 15)
    rt = v3.rows_to_planes(rows)
    w = 1.0 - u - v
    tu = w * rt[9] + u * rt[11] + v * rt[13]
    tv = w * rt[10] + u * rt[12] + v * rt[14]
    n_obj = V3(w * rt[0] + u * rt[3] + v * rt[6],
               w * rt[1] + u * rt[4] + v * rt[7],
               w * rt[2] + u * rt[5] + v * rt[8])
    si = jnp.maximum(inst_id, 0)
    i_n = tl.normal_mat.shape[0]
    nm = v3.rows_to_planes(
        tl.normal_mat.reshape(i_n, 9)[si])            # 9 (N,) planes
    normal = v3.normalize(V3(
        nm[0] * n_obj.x + nm[1] * n_obj.y + nm[2] * n_obj.z,
        nm[3] * n_obj.x + nm[4] * n_obj.y + nm[5] * n_obj.z,
        nm[6] * n_obj.x + nm[7] * n_obj.y + nm[8] * n_obj.z))
    mrows = materials[tl.inst_mat[si]]                # (N, MAT_W)
    mt = v3.rows_to_planes(mrows)
    return normal, MatP.from_rows_t(mt), mrows, (tu, tv)
