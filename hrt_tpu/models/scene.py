"""Scene authoring API + build() -> flat SoA device arrays.

Same authoring surface as the reference
(loadModel / createMaterial / createLight / createInstance / build,
ref: Graphics/RayTracing/Scene.h:137-151), but `build()` produces a
pytree of jnp arrays instead of Vulkan acceleration structures: the
BLAS/TLAS the driver builds at Scene.cpp:256-311 becomes our own LBVH
(ops/lbvh.py) over the flattened world-space triangle soup.

Design notes (TPU-first):
- Geometry is flattened at build time: every instance's triangles are
  pre-transformed to world space into one SoA pool (v0/e1/e2 + shading
  attributes).  This trades HBM for a single-level BVH and pure
  gather-free leaf layout — the right call on TPU where the traversal
  kernel wants contiguous triangle blocks, and scenes fit HBM easily.
- Arrays are padded to PAD (128) triangles with degenerate (e1=e2=0)
  records that can never produce hits, keeping shapes static for XLA.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from . import lights as lights_mod
from . import materials as mat_mod
from . import textures as tex_mod
from . import sky as sky_mod
from .instance import MeshInstance
from .mesh import Mesh, load_obj

PAD = 128  # triangle-pool padding quantum (one VPU lane row)


class SceneData(NamedTuple):
    """Flat device scene (the 'scene info' of SceneBufferInfo,
    ref: Scene.h:106-121, re-expressed as arrays instead of pointers)."""

    # World-space triangle soup, padded to a multiple of PAD:
    tri_v0: jnp.ndarray   # (T, 3) f32
    tri_e1: jnp.ndarray   # (T, 3) f32   v1 - v0
    tri_e2: jnp.ndarray   # (T, 3) f32   v2 - v0
    nrm0: jnp.ndarray     # (T, 3) f32   world-space vertex normals
    nrm1: jnp.ndarray     # (T, 3)
    nrm2: jnp.ndarray     # (T, 3)
    uv0: jnp.ndarray      # (T, 2)
    uv1: jnp.ndarray      # (T, 2)
    uv2: jnp.ndarray      # (T, 2)
    tri_mat: jnp.ndarray  # (T,) i32 material id (padding: 0)
    tri_inst: jnp.ndarray  # (T,) i32 instance id (padding: -1)
    tri_valid: jnp.ndarray  # (T,) f32 1.0 for real triangles, 0.0 padding
    # Tables:
    materials: jnp.ndarray  # (M, MAT_W) f32
    lights: jnp.ndarray     # (L, LIGHT_W) f32
    sky: jnp.ndarray        # (SKY_W_FULL,) f32
    # Per-instance world AABBs (culling pre-pass, ops/culling.py):
    inst_bmin: jnp.ndarray  # (I, 3) f32
    inst_bmax: jnp.ndarray  # (I, 3) f32
    # Packed base-color textures (models/textures.py); (0, R, R, 3)
    # when the scene has none.
    textures: jnp.ndarray = None
    # Pre-built light BVH (ops/lightbvh.LightTree) — built once at
    # scene build so shading never re-sorts the lights per program
    # (the morton sort + per-level reductions are static per scene).
    # None when lights are empty or the scene was constructed directly.
    light_tree: object = None

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]


class Scene:
    """Host-side scene builder (ref: Scene.h:132-192)."""

    def create_texture(self, image) -> int:
        """Register a base-color texture (any HxWx3 array, 8-bit or
        float); returns the id for create_material(texture=...).
        Extension — the reference ships UVs but no image textures."""
        self.textures.append(np.asarray(image))
        return len(self.textures) - 1

    def __init__(self):
        self.meshes: list[Mesh] = []
        self.materials: list[np.ndarray] = []
        self.textures: list[np.ndarray] = []
        self.lights: list[np.ndarray] = []
        self.instances: list[MeshInstance] = []
        self.sky: np.ndarray = sky_mod.default_sky()

    # -- authoring (same call surface as the reference) ------------------
    def load_model(self, path: str) -> int:
        """ref: Scene::loadModel (Scene.cpp:29-74)."""
        self.meshes.append(load_obj(path))
        return len(self.meshes) - 1

    def add_mesh(self, mesh: Mesh) -> int:
        self.meshes.append(mesh)
        return len(self.meshes) - 1

    def create_material(self, color=(1.0, 1.0, 1.0), metallic: float = 0.0,
                        roughness: float = 1.0,
                        emissive_color=(0.0, 0.0, 0.0),
                        emission_strength: float = 0.0, **extras) -> int:
        """ref: Scene::createMaterial (Scene.cpp:80-86).  Unlike the
        reference, emissive args are stored, not dropped."""
        self.materials.append(
            mat_mod.make_material(color, metallic, roughness,
                                  emissive_color, emission_strength,
                                  **extras))
        return len(self.materials) - 1

    def create_light(self, position, color, intensity: float,
                     light_type: int = lights_mod.POINT,
                     direction=(0.0, 0.0, 0.0),
                     cone_angle: float = 0.0) -> int:
        """ref: Scene::createLight (Scene.cpp:88-98); direction/cone are
        extensions making SPOT/DIRECTIONAL real (the reference declares
        the enum but hard-codes non-point directions)."""
        self.lights.append(
            lights_mod.make_light(position, color, intensity, light_type,
                                  direction, cone_angle))
        return len(self.lights) - 1

    # -- editing (the reference declares these but stubs them,
    # ref: Scene.cpp:122-133) --------------------------------------------
    def destroy_instance(self, instance_id: int) -> None:
        """Swap-with-last removal (ref: Scene::destroyInstance
        semantics, Scene.cpp:122-125)."""
        self.instances[instance_id] = self.instances[-1]
        self.instances.pop()

    def destroy_light(self, light_id: int) -> None:
        self.lights[light_id] = self.lights[-1]
        self.lights.pop()

    def destroy_material(self, material_id: int) -> None:
        """Removes a material; instances referencing it are remapped to
        material 0 (the reference stub never implemented a policy)."""
        self.materials[material_id] = self.materials[-1]
        moved = len(self.materials) - 1
        self.materials.pop()
        for inst in self.instances:
            if inst.material_id == material_id:
                inst.material_id = 0
            elif inst.material_id == moved:
                inst.material_id = material_id

    def unload_model(self, mesh_id: int) -> None:
        """Removes a mesh and every instance referencing it."""
        self.instances = [i for i in self.instances
                          if i.mesh_id != mesh_id]
        moved = len(self.meshes) - 1
        self.meshes[mesh_id] = self.meshes[-1]
        self.meshes.pop()
        for inst in self.instances:
            if inst.mesh_id == moved:
                inst.mesh_id = mesh_id

    def create_instance(self, mesh_id: int, material_id: int,
                        position=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0),
                        scale=(1.0, 1.0, 1.0)) -> int:
        """ref: Scene::createInstance (Scene.cpp:76-78)."""
        self.instances.append(
            MeshInstance(mesh_id, material_id, tuple(position),
                         tuple(rotation), tuple(scale)))
        return len(self.instances) - 1

    def set_sky(self, **kwargs) -> None:
        name_to_idx = {
            "sky_color": sky_mod.SKY_COLOR,
            "horizon_color": sky_mod.HORIZON_COLOR,
            "ground_color": sky_mod.GROUND_COLOR,
            "sun_direction": sky_mod.SUN_DIRECTION,
            "up_direction": sky_mod.UP_DIRECTION,
            "brightness": sky_mod.BRIGHTNESS,
            "horizon_size": sky_mod.HORIZON_SIZE,
            "angular_size": sky_mod.ANGULAR_SIZE,
            "glow_intensity": sky_mod.GLOW_INTENSITY,
            "glow_sharpness": sky_mod.GLOW_SHARPNESS,
            "glow_size": sky_mod.GLOW_SIZE,
            "light_radiance": sky_mod.LIGHT_RADIANCE,
        }
        for k, v in kwargs.items():
            self.sky[name_to_idx[k]] = v

    # -- build -----------------------------------------------------------
    def build_host(self):
        """Flatten to world-space numpy SoA (the host half of build())."""
        if not self.instances:
            raise ValueError("scene has no instances")
        if not self.materials:
            raise ValueError("scene has no materials")
        v0s, e1s, e2s = [], [], []
        n0s, n1s, n2s = [], [], []
        uv0s, uv1s, uv2s = [], [], []
        mats, insts = [], []
        inst_bmin, inst_bmax = [], []
        for inst_id, inst in enumerate(self.instances):
            mesh = self.meshes[inst.mesh_id]
            m = inst.transform
            nm = inst.normal_matrix
            pos = mesh.vertices[:, 0:3] @ m[:, :3].T + m[:, 3]
            nrm = mesh.vertices[:, 3:6] @ nm.T
            nlen = np.linalg.norm(nrm, axis=-1, keepdims=True)
            nrm = nrm / np.maximum(nlen, 1e-12)
            uv = mesh.vertices[:, 6:8]
            i0, i1, i2 = (mesh.indices[:, 0], mesh.indices[:, 1],
                          mesh.indices[:, 2])
            v0s.append(pos[i0])
            e1s.append(pos[i1] - pos[i0])
            e2s.append(pos[i2] - pos[i0])
            n0s.append(nrm[i0]); n1s.append(nrm[i1]); n2s.append(nrm[i2])
            uv0s.append(uv[i0]); uv1s.append(uv[i1]); uv2s.append(uv[i2])
            t = mesh.num_triangles
            mats.append(np.full(t, inst.material_id, np.int32))
            insts.append(np.full(t, inst_id, np.int32))
            inst_bmin.append(pos.min(axis=0))
            inst_bmax.append(pos.max(axis=0))

        def cat(xs):
            return np.concatenate(xs, axis=0).astype(np.float32)

        host = {
            "tri_v0": cat(v0s), "tri_e1": cat(e1s), "tri_e2": cat(e2s),
            "nrm0": cat(n0s), "nrm1": cat(n1s), "nrm2": cat(n2s),
            "uv0": cat(uv0s), "uv1": cat(uv1s), "uv2": cat(uv2s),
            "tri_mat": np.concatenate(mats),
            "tri_inst": np.concatenate(insts),
        }
        t = host["tri_v0"].shape[0]
        host["tri_valid"] = np.ones(t, np.float32)
        return host, (np.stack(inst_bmin).astype(np.float32),
                      np.stack(inst_bmax).astype(np.float32))

    def build(self, pad: int = PAD) -> SceneData:
        """ref: Scene::build (Scene.cpp:100-120) — flatten, pad, upload."""
        host, (inst_bmin, inst_bmax) = self.build_host()
        t = host["tri_v0"].shape[0]
        t_pad = ((t + pad - 1) // pad) * pad
        extra = t_pad - t
        if extra:
            for k, v in host.items():
                pad_width = [(0, extra)] + [(0, 0)] * (v.ndim - 1)
                fill = -1 if k == "tri_inst" else 0
                host[k] = np.pad(v, pad_width, constant_values=fill)
        lights = jnp.asarray(
            np.stack(self.lights) if self.lights
            else np.zeros((0, lights_mod.LIGHT_W), np.float32))
        if self.lights:
            from ..ops import lightbvh

            light_tree = lightbvh.build_light_tree(lights)
        else:
            light_tree = None
        return SceneData(
            **{k: jnp.asarray(v) for k, v in host.items()},
            materials=jnp.asarray(np.stack(self.materials)),
            lights=lights,
            sky=jnp.asarray(self.sky),
            inst_bmin=jnp.asarray(inst_bmin),
            inst_bmax=jnp.asarray(inst_bmax),
            textures=jnp.asarray(tex_mod.pack_textures(self.textures)),
            light_tree=light_tree,
        )


def reference_demo_scene(plane_mesh: Mesh | None = None) -> Scene:
    """The hard-coded demo scene of RTApp (ref: RTApp.cpp:4-16):
    Plane.obj x2 instances, 2 materials, 3 point lights.  The repo does
    not ship models/Plane.obj, so a unit plane stands in."""
    from .mesh import plane

    sc = Scene()
    sc.add_mesh(plane_mesh if plane_mesh is not None else plane(1.0))
    sc.create_material((1.0, 1.0, 1.0), 1.0)        # metallic, rough=1
    sc.create_material((1.0, 1.0, 1.0), 1.0, 0.0)   # metallic, rough=0
    sc.create_light((1.0, 0.0, 0.0), (0.0, 0.0, 1.0), 2.0)
    sc.create_light((-1.0, 0.0, 0.0), (0.0, 1.0, 0.0), 2.0)
    sc.create_light((0.0, 0.0, -1.0), (1.0, 0.0, 0.0), 2.0)
    sc.create_instance(0, 1, (0.0, -1.0, 0.0), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    sc.create_instance(0, 0, (0.0, 1.0, 0.0), (0.0, 0.0, 0.0), (4.0, 1.0, 4.0))
    return sc
