"""Triangle meshes + OBJ loading with reference conventions.

Reproduces the reference loader's semantics (ref:
Graphics/RayTracing/Scene.cpp:29-74): tinyobj-style parse, Y axis
negated on load (positions AND normals — the world is y-down), and
exact-match vertex dedup keyed on (pos, normal, uv).  Vertex layout is
pos[3] + normal[3] + uv[2] = 8 f32 (ref: Scene.h:28-38).

A fast C++ loader (native/objloader.cpp) is used when its shared
library has been built; this pure-Python path is the always-available
fallback and the semantics oracle.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Mesh:
    """Host-side mesh: vertices (V, 8) f32, indices (T, 3) i32."""

    vertices: np.ndarray
    indices: np.ndarray

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0])

    @property
    def num_vertices(self) -> int:
        return int(self.vertices.shape[0])


def _parse_obj(text: str):
    """Minimal OBJ parser: v / vn / vt / f with polygon fan triangulation."""
    positions: list[tuple[float, float, float]] = []
    normals: list[tuple[float, float, float]] = []
    texcoords: list[tuple[float, float]] = []
    # Each face vertex is (vi, ti, ni) with -1 for "absent".
    face_verts: list[tuple[int, int, int]] = []

    def resolve(idx: int, n: int) -> int:
        # OBJ indices are 1-based; negative counts from the end.
        if idx > 0:
            return idx - 1
        if idx < 0:
            return n + idx
        return -1

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif tag == "vn":
            normals.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif tag == "vt":
            texcoords.append((float(parts[1]), float(parts[2])))
        elif tag == "f":
            corners = []
            for vert in parts[1:]:
                comps = vert.split("/")
                vi = resolve(int(comps[0]), len(positions))
                ti = (
                    resolve(int(comps[1]), len(texcoords))
                    if len(comps) > 1 and comps[1]
                    else -1
                )
                ni = (
                    resolve(int(comps[2]), len(normals))
                    if len(comps) > 2 and comps[2]
                    else -1
                )
                corners.append((vi, ti, ni))
            for k in range(1, len(corners) - 1):  # fan triangulation
                face_verts.extend((corners[0], corners[k], corners[k + 1]))
    return positions, normals, texcoords, face_verts


def load_obj(path_or_text: str, *, is_text: bool = False,
             use_native: bool = True) -> Mesh:
    """Load an OBJ file into a deduplicated Mesh (y-flipped, ref parity).

    Uses the C++ loader (native/objloader.cpp) when built; this Python
    path is the fallback and the semantics oracle."""
    if not is_text and use_native:
        try:
            from .. import native

            res = native.load_obj(path_or_text)
            if res is not None:
                return Mesh(vertices=res[0], indices=res[1])
        except FileNotFoundError:
            raise
        except Exception:
            pass  # fall through to the pure-Python parser
    if is_text:
        text = path_or_text
    else:
        with open(path_or_text, "r") as f:
            text = f.read()
    positions, normals, texcoords, face_verts = _parse_obj(text)

    unique: dict[bytes, int] = {}
    vertices: list[np.ndarray] = []
    indices: list[int] = []
    for vi, ti, ni in face_verts:
        v = np.zeros(8, np.float32)
        if vi >= 0:
            p = positions[vi]
            v[0], v[1], v[2] = p[0], -p[1], p[2]  # Y-flip, Scene.cpp:49
        if ni >= 0:
            n = normals[ni]
            v[3], v[4], v[5] = n[0], -n[1], n[2]  # Y-flip, Scene.cpp:55
        if ti >= 0:
            t = texcoords[ti]
            v[6], v[7] = t[0], t[1]
        key = v.tobytes()
        idx = unique.get(key)
        if idx is None:
            idx = len(vertices)
            unique[key] = idx
            vertices.append(v)
        indices.append(idx)

    verts = np.stack(vertices).astype(np.float32)
    tris = np.asarray(indices, np.int32).reshape(-1, 3)
    return Mesh(vertices=verts, indices=tris)


def make_mesh(positions: np.ndarray, indices: np.ndarray,
              normals: np.ndarray | None = None,
              uvs: np.ndarray | None = None) -> Mesh:
    """Build a Mesh from raw arrays (no Y-flip — caller's coordinates)."""
    positions = np.asarray(positions, np.float32).reshape(-1, 3)
    indices = np.asarray(indices, np.int32).reshape(-1, 3)
    n = positions.shape[0]
    verts = np.zeros((n, 8), np.float32)
    verts[:, 0:3] = positions
    if normals is None:
        normals = compute_vertex_normals(positions, indices)
    verts[:, 3:6] = np.asarray(normals, np.float32).reshape(-1, 3)
    if uvs is not None:
        verts[:, 6:8] = np.asarray(uvs, np.float32).reshape(-1, 2)
    return Mesh(vertices=verts, indices=indices)


def compute_vertex_normals(positions: np.ndarray,
                           indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals for meshes without vn records."""
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    face_n = np.cross(v1 - v0, v2 - v0)
    normals = np.zeros_like(positions)
    for k in range(3):
        np.add.at(normals, indices[:, k], face_n)
    lens = np.linalg.norm(normals, axis=-1, keepdims=True)
    return normals / np.maximum(lens, 1e-12)


# ---------------------------------------------------------------------------
# Procedural meshes for demo scenes / tests (the reference ships none of its
# models — models/Plane.obj is referenced at RTApp.cpp:4 but absent).
# ---------------------------------------------------------------------------

def plane(size: float = 1.0) -> Mesh:
    """Unit XZ plane centered at origin, normal -Y (up, in a y-down world)."""
    s = size
    pos = np.array(
        [[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32
    )
    nrm = np.tile(np.array([[0, -1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    # Wind so the geometric normal (cross(e1, e2)) matches -Y.
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    verts = np.concatenate([pos, nrm, uv], axis=1)
    return Mesh(vertices=verts, indices=idx)


def cube(size: float = 1.0) -> Mesh:
    """Axis-aligned cube with per-face normals, edge length 2*size."""
    s = size
    faces = []
    # (axis, sign) for each of the 6 faces
    for axis in range(3):
        for sign in (-1.0, 1.0):
            n = np.zeros(3, np.float32)
            n[axis] = sign
            a = (axis + 1) % 3
            b = (axis + 2) % 3
            corners = []
            for da, db in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                p = np.zeros(3, np.float32)
                p[axis] = sign * s
                p[a] = da * s
                p[b] = db * s
                corners.append(p)
            faces.append((np.stack(corners), n))
    pos_list, nrm_list, idx_list = [], [], []
    base = 0
    for corners, n in faces:
        pos_list.append(corners)
        nrm_list.append(np.tile(n[None], (4, 1)))
        # Orient winding so cross(e1,e2) points along n.
        c = corners
        wind = [0, 1, 2] if np.dot(np.cross(c[1] - c[0], c[2] - c[0]), n) > 0 \
            else [0, 2, 1]
        tri2 = [0, 2, 3] if wind == [0, 1, 2] else [0, 3, 2]
        idx_list.append(np.array([wind, tri2], np.int32) + base)
        base += 4
    pos = np.concatenate(pos_list)
    nrm = np.concatenate(nrm_list)
    uv = np.zeros((pos.shape[0], 2), np.float32)
    verts = np.concatenate([pos, nrm, uv], axis=1).astype(np.float32)
    return Mesh(vertices=verts, indices=np.concatenate(idx_list))


def icosphere(subdivisions: int = 2, radius: float = 1.0) -> Mesh:
    """Icosphere with smooth normals — triangle-count scaling knob for bench."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    pos = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    idx = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdivisions):
        edge_mid: dict[tuple[int, int], int] = {}
        pos_list = list(pos)

        def midpoint(a: int, b: int) -> int:
            key = (min(a, b), max(a, b))
            m = edge_mid.get(key)
            if m is None:
                p = pos_list[a] + pos_list[b]
                p = p / np.linalg.norm(p)
                m = len(pos_list)
                pos_list.append(p)
                edge_mid[key] = m
            return m

        new_idx = []
        for a, b, c in idx:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_idx += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        pos = np.stack(pos_list)
        idx = np.asarray(new_idx, np.int64)
    normals = pos.copy()
    return make_mesh(pos * radius, idx.astype(np.int32),
                     normals=normals.astype(np.float32))
