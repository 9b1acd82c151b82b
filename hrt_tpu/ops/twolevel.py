"""Two-level acceleration structure: per-mesh BLAS + instance TLAS.

Mirrors the reference's BLAS/TLAS split (ref: Scene.cpp:163-254 —
createBottomAS per mesh, createTopAS over VkAccelerationStructure
instances with 3x4 transforms).  The flattened single-level soup
(models/scene.py) remains the fast path for static scenes; this mode
trades peak traversal speed for instancing:

- BLAS: one LBVH per unique mesh, built in OBJECT space once —
  transforming an instance never invalidates it;
- TLAS: the world AABBs of all instances; rays test instance AABBs
  first (vectorized over rays x instances), then traverse each
  surviving BLAS in object space (rays transformed by the inverse
  instance matrix, ref: ObjectToWorld4x3/WorldToObject4x3 usage at
  shaders/raytracing.slang:144-145).

Closest hit across instances is an associative min — the loop over
instances is a lax.scan carrying best-hit state.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mesh import Mesh
from ..models.scene import PAD, Scene
from . import lbvh
from .intersect import INF, ray_aabb, safe_inv_dir
from .traversal import _traverse


class BLAS(NamedTuple):
    """Object-space per-mesh acceleration + shading attributes."""

    accel_tree: lbvh.BVH
    nrm: jnp.ndarray      # (T, 3, 3) per-corner object-space normals
    uv: jnp.ndarray       # (T, 3, 2)
    num_tris: jnp.ndarray


class TwoLevelAccel(NamedTuple):
    """TLAS + stacked BLAS (meshes padded to a common triangle count).

    blas_* arrays have a leading mesh axis; instances carry transforms.
    """

    # TLAS:
    inst_bmin: jnp.ndarray    # (I, 3) world AABBs
    inst_bmax: jnp.ndarray    # (I, 3)
    inst_mesh: jnp.ndarray    # (I,) i32
    inst_mat: jnp.ndarray     # (I,) i32
    world_from_obj: jnp.ndarray   # (I, 3, 4)
    obj_from_world: jnp.ndarray   # (I, 3, 4)
    normal_mat: jnp.ndarray       # (I, 3, 3)
    # Stacked BLAS (leading axis = mesh id):
    tree: lbvh.BVH            # every field has leading mesh axis
    nrm0: jnp.ndarray         # (M, T, 3) object-space shading attrs,
    nrm1: jnp.ndarray         # leaf-ordered to match tree.tri_*
    nrm2: jnp.ndarray
    uv0: jnp.ndarray
    uv1: jnp.ndarray
    uv2: jnp.ndarray


def _mesh_scene_arrays(mesh: Mesh, t_pad: int):
    """Object-space SoA arrays for one mesh, padded to t_pad tris."""
    v = mesh.vertices
    i0, i1, i2 = mesh.indices[:, 0], mesh.indices[:, 1], mesh.indices[:, 2]
    pos = v[:, 0:3]
    nrm = v[:, 3:6]
    uv = v[:, 6:8]
    t = mesh.num_triangles

    def padded(x, fill=0.0):
        out = np.full((t_pad,) + x.shape[1:], fill, np.float32)
        out[:t] = x
        return out

    return {
        "tri_v0": padded(pos[i0]),
        "tri_e1": padded(pos[i1] - pos[i0]),
        "tri_e2": padded(pos[i2] - pos[i0]),
        "nrm0": padded(nrm[i0]), "nrm1": padded(nrm[i1]),
        "nrm2": padded(nrm[i2]),
        "uv0": padded(uv[i0]), "uv1": padded(uv[i1]), "uv2": padded(uv[i2]),
        "tri_valid": padded(np.ones((t,), np.float32)),
    }


def build_two_level(scene: Scene, leaf_size: int = 8) -> TwoLevelAccel:
    """Build BLAS per mesh + TLAS over instances (host orchestration,
    device builds)."""
    from ..models.scene import SceneData  # field names shared

    if not scene.meshes or not scene.instances:
        raise ValueError("scene needs meshes and instances")
    t_pad = max(PAD, max(((m.num_triangles + PAD - 1) // PAD) * PAD
                         for m in scene.meshes))

    trees, attrs = [], []
    for mesh in scene.meshes:
        arrs = _mesh_scene_arrays(mesh, t_pad)
        fake = SceneData(
            **{k: jnp.asarray(v) for k, v in arrs.items()},
            tri_mat=jnp.zeros((t_pad,), jnp.int32),
            tri_inst=jnp.zeros((t_pad,), jnp.int32),
            materials=jnp.zeros((1, 1)), lights=jnp.zeros((0, 8)),
            sky=jnp.zeros((22,)),
            inst_bmin=jnp.zeros((1, 3)), inst_bmax=jnp.zeros((1, 3)))
        accel = lbvh.build_bvh(fake, leaf_size)
        trees.append(accel.tree)
        # Shading attributes reordered into the tree's leaf order.
        perm = accel.tree.tri_perm
        attrs.append(tuple(
            jnp.asarray(arrs[k])[perm]
            for k in ("nrm0", "nrm1", "nrm2", "uv0", "uv1", "uv2")))

    tree = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    a0 = [jnp.stack([a[i] for a in attrs]) for i in range(6)]

    _, (bmin, bmax) = scene.build_host()
    inst = scene.instances
    return TwoLevelAccel(
        inst_bmin=jnp.asarray(bmin), inst_bmax=jnp.asarray(bmax),
        inst_mesh=jnp.asarray([i.mesh_id for i in inst], jnp.int32),
        inst_mat=jnp.asarray([i.material_id for i in inst], jnp.int32),
        world_from_obj=jnp.asarray(
            np.stack([i.transform for i in inst])),
        obj_from_world=jnp.asarray(
            np.stack([i.inverse_transform for i in inst])),
        normal_mat=jnp.asarray(np.stack([i.normal_matrix for i in inst])),
        tree=tree, nrm0=a0[0], nrm1=a0[1], nrm2=a0[2],
        uv0=a0[3], uv1=a0[4], uv2=a0[5],
    )


@functools.partial(jax.jit, static_argnames=("leaf_size", "t_min",
                                             "find_closest"))
def trace_two_level(accel: TwoLevelAccel, o, d, t_max,
                    leaf_size: int = 8, t_min: float = 1e-3,
                    find_closest: bool = True):
    """Trace rays through TLAS -> BLAS.

    Returns (t, inst_id, tri_id(local sorted-pool), u, v) for closest
    mode; (occluded,) semantics via inst_id >= 0 for any-hit.
    The instance loop is a lax.scan (few instances; each step is a
    fully-vectorized BLAS traversal of every ray, masked by the
    instance's TLAS AABB test)."""
    n = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_d = safe_inv_dir(d)

    def scan_step(carry, xs):
        idx, state = carry
        (bmin, bmax, mesh_id, m_obj) = xs
        best_t, best_inst, best_tri, best_u, best_v = state
        hit_box, _ = ray_aabb(o, inv_d, bmin, bmax, t_min, best_t)
        # Object-space rays; direction left unnormalized so t stays the
        # world-space parameter (world hit = o + t*d exactly).
        oo = jnp.einsum("ij,nj->ni", m_obj[:, :3], o) + m_obj[:, 3]
        od = jnp.einsum("ij,nj->ni", m_obj[:, :3], d)
        tree = jax.tree.map(lambda x: x[mesh_id], accel.tree)
        t, tri, u, v, _ = _traverse(tree, oo, od, t_min, best_t,
                                    find_closest, k=leaf_size)
        better = (tri >= 0) & (t < best_t) & hit_box
        state = (jnp.where(better, t, best_t),
                 jnp.where(better, idx, best_inst),
                 jnp.where(better, tri, best_tri),
                 jnp.where(better, u, best_u),
                 jnp.where(better, v, best_v))
        return (idx + 1, state), None

    init = (jnp.int32(0),
            (t_max, jnp.full((n,), -1, jnp.int32),
             jnp.full((n,), -1, jnp.int32),
             jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32)))
    (_, state), _ = jax.lax.scan(
        scan_step, init,
        (accel.inst_bmin, accel.inst_bmax, accel.inst_mesh,
         accel.obj_from_world))
    return state


def shade_attrs_two_level(accel: TwoLevelAccel, inst_id, tri_id, u, v):
    """Gather + interpolate + world-transform shading attributes for
    two-level hits (ref: rchitMain attribute fetch)."""
    safe_i = jnp.maximum(inst_id, 0)
    mesh = accel.inst_mesh[safe_i]
    safe_t = jnp.maximum(tri_id, 0)
    w = 1.0 - u - v
    n0 = accel.nrm0[mesh, safe_t]
    n1 = accel.nrm1[mesh, safe_t]
    n2 = accel.nrm2[mesh, safe_t]
    nrm_obj = w[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2
    nm = accel.normal_mat[safe_i]
    nrm = jnp.einsum("nij,nj->ni", nm, nrm_obj)
    from .math3d import normalize

    uv = (w[:, None] * accel.uv0[mesh, safe_t]
          + u[:, None] * accel.uv1[mesh, safe_t]
          + v[:, None] * accel.uv2[mesh, safe_t])
    mat = accel.inst_mat[safe_i]
    return normalize(nrm), uv, mat
