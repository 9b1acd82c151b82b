"""Pre-warm the persistent compilation cache for a set of render
configs/resolutions, so first-frame latency at a new output size is a
cache hit (~5 s) instead of a cold Mosaic compile (0.5-8 min).

The reference handles live resize by recreating the swapchain and
re-recording command buffers in milliseconds
(Graphics/RayTracing/RTApp.cpp:214-232); under XLA a new resolution is
a new static-shape program, so the equivalent usability is provided by
compiling ahead of time into the persistent cache
(~/.cache/hrt_tpu_xla, set up in hrt_tpu/__init__.py) — once per
machine, not per process.

Usage:
    python scripts/prewarm.py                 # the 5 BASELINE configs
    python scripts/prewarm.py --sizes 640x480,1280x720
    python scripts/prewarm.py --scene path/to/file.obj --sizes ...

Compilation is keyed by (config, resolution, scene SHAPES) — triangle
pool sizes are padded to 128 multiples (ops/lbvh.py), so any scene
whose padded pool size matches a warmed one reuses its entry.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def warm(scene_obj, cfg, two_level=False):
    """Compile (but don't run) the FrameLoop step program for cfg."""
    import jax
    import jax.numpy as jnp

    from hrt_tpu.frameloop import FrameLoop, frame_program
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.renderer import camera_arrays

    t0 = time.perf_counter()
    loop = FrameLoop(scene_obj, cfg, cull_threshold_px=0.0,
                     two_level=two_level)
    cams = camera_arrays(Camera(position=(0.0, -1.0, -6.0),
                                rotation=(-0.15, 0.0, 0.0)), cfg)
    # AOT lower+compile: fills the persistent cache without paying an
    # actual render.  frame_program is the exact jit the loop calls.
    frame_program.lower(
        loop.scene, loop.accel, cams, cams, loop.dn_state, loop.accum,
        jnp.uint32(0), cfg, net=loop.net,
        up_params=loop.upscaler_params,
        up_history=loop.up_history).compile()
    dt = time.perf_counter() - t0
    print(f"  warmed {cfg.width}x{cfg.height} depth={cfg.max_depth} "
          f"denoise={cfg.denoise} upscale={cfg.upscale} "
          f"in {dt:.1f} s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="",
                    help="comma-separated WxH list; default = the "
                         "five BASELINE configs")
    ap.add_argument("--scene", default="bench",
                    help="bench | demo | path to .obj")
    ap.add_argument("--depth", type=int, default=5)
    args = ap.parse_args()

    import bench
    from hrt_tpu.config import RenderConfig

    if args.scene == "bench":
        scene = bench.build_bench_scene()
    elif args.scene == "demo":
        from hrt_tpu.models.scene import reference_demo_scene

        scene = reference_demo_scene()
    else:
        from hrt_tpu.models.scene import Scene

        sc = Scene()
        mesh = sc.add_mesh_from_obj(args.scene)
        mat = sc.create_material((0.8, 0.8, 0.8), 0.0, 0.8)
        sc.create_light((0.0, -4.0, -2.0), (1.0, 1.0, 1.0), 30.0)
        sc.create_instance(mesh, mat, (0.0, 0.0, 0.0))
        scene = sc

    total = 0.0
    if args.sizes:
        for wh in args.sizes.split(","):
            w, h = map(int, wh.lower().split("x"))
            total += warm(scene, RenderConfig(
                width=w, height=h, max_depth=args.depth, sky=True,
                indirect=args.depth > 1, jitter=True, accumulate=True,
                sort_bounces=args.depth > 1, traversal="pallas"))
    else:
        from hrt_tpu.models.scenefile import cornell_box

        cornell = cornell_box()
        total += warm(scene, RenderConfig(
            width=800, height=600, max_depth=1, sky=True,
            traversal="pallas"))
        total += warm(cornell, RenderConfig(
            width=800, height=600, max_depth=4, indirect=True,
            russian_roulette=False, traversal="pallas"))
        total += warm(cornell, RenderConfig(
            width=800, height=600, max_depth=2, sky=False,
            traversal="pallas"))
        total += warm(scene, RenderConfig(
            width=1920, height=1080, max_depth=5, sky=True,
            indirect=True, jitter=True, accumulate=True,
            sort_bounces=True, traversal="pallas"))
        total += warm(scene, RenderConfig(
            width=1920, height=1080, max_depth=3, sky=True,
            indirect=True, jitter=True, denoise=True,
            sort_bounces=True, upscale=2, traversal="pallas"))
    print(f"total {total:.1f} s; subsequent cold processes hit the "
          "persistent cache for these shapes")


if __name__ == "__main__":
    main()
