"""Kernel tuning sweep: tile rows x leaf unroll x block reorder.

Run as separate processes per config (Mosaic params are module-level):
    python scripts/sweep_kernel.py            # orchestrate all configs
    python scripts/sweep_kernel.py ROWS UNROLL BLOCK   # one config
Results append to /tmp/hrt_sweep.jsonl.
"""
import json
import os
import subprocess
import sys
import time


def run_one(rows: int, unroll: int, block: int) -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.ops import lbvh
    from hrt_tpu.renderer import camera_arrays, render_frame

    scene = bench.build_bench_scene().build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=16)
    cfg = RenderConfig(width=512, height=384, max_depth=1, sky=True,
                       traversal="pallas", block_reorder=bool(block))
    cams = camera_arrays(Camera(position=(0, -1, -6),
                                rotation=(-0.15, 0, 0)), cfg)
    t0 = time.perf_counter()
    img = jax.block_until_ready(
        render_frame(scene, accel, cams, jnp.uint32(0), cfg))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(5):
        img = render_frame(scene, accel, cams, jnp.uint32(i), cfg)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / 5
    mrays = bench.rays_per_frame(cfg, scene.lights.shape[0]) / dt / 1e6
    rec = {"rows": rows, "unroll": unroll, "block": block,
           "ms": round(dt * 1e3, 2), "mrays": round(mrays, 1),
           "compile_s": round(compile_s, 1)}
    with open("/tmp/hrt_sweep.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main() -> None:
    if len(sys.argv) == 4:
        run_one(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
        return
    configs = [(64, 4, 1), (32, 4, 1), (32, 2, 1), (16, 2, 1),
               (64, 4, 0), (16, 4, 1), (8, 2, 1)]
    for rows, unroll, block in configs:
        env = dict(os.environ)
        env["HRT_TILE_ROWS"] = str(rows)
        env["HRT_LEAF_UNROLL"] = str(unroll)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(rows), str(unroll), str(block)], env=env,
                       timeout=1200)


if __name__ == "__main__":
    main()
