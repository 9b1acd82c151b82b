"""Big-scene validation + benchmark: node AND leaf tables streamed
from HBM (the >MAX_NODE_F32 / >MAX_VMEM_F32 regime).

The reference's driver handles arbitrary-size BVHs transparently
(vkCmdBuildAccelerationStructuresKHR, Scene.cpp:304); this checks our
packet kernel does too: a ~2.6M-triangle scene whose flat node table
exceeds the VMEM budget, traced row-by-row via the per-walk DMA cache
(ops/traversal_pallas._row_fetcher_stream).

Prints a JSON line with correctness (vs brute-force oracle on a ray
subset) and the streamed closest-pass rate.

Usage: python scripts/bench_bigscene.py [--sub 8] [--oracle-rays 1024]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=8,
                    help="icosphere subdivision (8 -> 2.62M tris x2)")
    ap.add_argument("--oracle-rays", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import hrt_tpu.ops.traversal_pallas as tp
    from hrt_tpu.models.mesh import icosphere, plane
    from hrt_tpu.models.scene import Scene
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import intersect, lbvh
    from hrt_tpu.renderer import camera_arrays

    t0 = time.perf_counter()
    sc = Scene()
    big = sc.add_mesh(icosphere(args.sub))
    mat = sc.create_material()
    sc.create_instance(big, mat, (0.0, 0.0, 0.0))
    sc.create_instance(big, mat, (2.5, 0.0, 0.0))
    gnd = sc.add_mesh(plane(8.0))
    sc.create_instance(gnd, mat, (0.0, 1.2, 0.0))
    scene = sc.build()
    n_tris = int(scene.num_triangles)
    print(f"# scene: {n_tris} tris, built in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    accel = lbvh.build_bvh_sah(scene, leaf_size=16)
    jax.block_until_ready(accel.flat.nodes)
    node_f32 = int(accel.flat.nodes.size)
    streams_nodes = node_f32 > tp.MAX_NODE_F32
    print(f"# bvh: {node_f32} node f32 ({node_f32 * 4 / 1e6:.1f} MB), "
          f"streams_nodes={streams_nodes}, build "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    cfg = RenderConfig(width=512, height=384)
    cams = camera_arrays(Camera(position=(1.2, -1.0, -7.0),
                                rotation=(-0.1, 0.0, 0.0)), cfg)
    o, d = primary_rays_p(cams.origin, cams.basis, cams.tan_half_fovy,
                          cams.aspect, cfg.width, cfg.height)
    o, d = o.reshape(-1), d.reshape(-1)
    n = o.x.shape[0]

    # Correctness: kernel vs brute force on a ray subset.
    k = args.oracle_rays
    t_k, tri_k, _, _ = tp.closest_hit_p(scene, accel, o, d, 1e-3, 1e32)
    jax.block_until_ready(t_k)
    oa = jnp.stack([o.x[:k], o.y[:k], o.z[:k]], -1)
    da = jnp.stack([d.x[:k], d.y[:k], d.z[:k]], -1)
    t_b, tri_b, _, _ = intersect.closest_hit_bruteforce(
        oa, da, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        1e-3, jnp.full((k,), 1e32, jnp.float32), chunk=65536)
    tri_match = np.mean(np.asarray(tri_k[:k]) == np.asarray(tri_b))
    both = np.asarray(tri_b) >= 0
    t_err = float(np.max(np.abs(np.asarray(t_k[:k])[both]
                                - np.asarray(t_b)[both]))) if both.any() else 0.0

    # Streamed closest-pass rate (best-of-batches, scan-amortized).
    from hrt_tpu.ops.v3 import V3

    @jax.jit
    def pass_k(ox, oy, oz, dx, dy, dz):
        def step(c, _):
            t, tri, _, _ = tp.closest_hit_p(
                scene, accel, V3(ox, oy, oz), V3(dx, dy, dz),
                1e-3, 1e32, sorted_ids=True)
            return c + jnp.sum(t * 0), None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=args.reps)
        return c

    pass_k(o.x, o.y, o.z, d.x, d.y, d.z).block_until_ready()
    dt = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        pass_k(o.x, o.y, o.z, d.x, d.y, d.z).block_until_ready()
        dt = min(dt, (time.perf_counter() - t1) / args.reps)
    mrays = n / dt / 1e6

    print(json.dumps({
        "metric": "bigscene_closest_Mray/s",
        "tris": n_tris,
        "node_f32": node_f32,
        "streams_nodes": bool(streams_nodes),
        "oracle_tri_match": round(float(tri_match), 6),
        "oracle_t_maxerr": t_err,
        "value": round(mrays, 2),
    }))


if __name__ == "__main__":
    main()
