"""CLI frame driver: the TPU replacement for main.cpp + RTApp::run()
(ref: main.cpp:5-13, Graphics/RayTracing/RTApp.cpp:29-85) — renders
frames (scripted camera instead of GLFW input) and writes PNG/NPZ.

Usage:
  python -m hrt_tpu.render --scene demo --out frame.png
  python -m hrt_tpu.render --scene scenes/cornell.yaml --frames 8 --orbit
"""
from __future__ import annotations

import argparse
import os
import json
import time

import jax
import jax.numpy as jnp

from .config import CONFIGS, RenderConfig
from .models.camera import Camera, orbit_camera
from .utils.image import tonemap, write_png
from .utils.logging import FrameStats, build_step, logger


def load_scene(spec: str):
    """Built-in scene names or a YAML scene file (scenes/*.yaml)."""
    from .models.scene import Scene, reference_demo_scene

    if spec == "demo":
        return reference_demo_scene()
    if spec == "bench":
        import bench

        return bench.build_bench_scene()
    if spec == "cornell":
        from .models.scenefile import cornell_box

        return cornell_box()
    if spec.endswith((".yaml", ".yml")):
        from .models.scenefile import load_scene_yaml

        return load_scene_yaml(spec)
    if spec.endswith(".obj"):
        sc = Scene()
        sc.load_model(spec)
        sc.create_material((0.8, 0.8, 0.8), 0.0, 0.8)
        sc.create_light((0.0, -3.0, -3.0), (1.0, 1.0, 1.0), 20.0)
        sc.create_instance(0, 0)
        return sc
    raise SystemExit(f"unknown scene: {spec}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="hrt_tpu.render")
    ap.add_argument("--scene", default="demo")
    ap.add_argument("--out", default="frame.png")
    ap.add_argument("--config", default=None,
                    help=f"named config: {', '.join(CONFIGS)}")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--sky", action="store_true")
    ap.add_argument("--indirect", action="store_true")
    ap.add_argument("--denoise", action="store_true")
    ap.add_argument("--traversal", default="auto")
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--orbit", action="store_true",
                    help="animate camera on an orbit path")
    ap.add_argument("--camera", type=float, nargs=6,
                    metavar=("X", "Y", "Z", "RX", "RY", "RZ"),
                    default=(0.0, 0.0, -2.0, 0.0, 0.0, 0.0))
    ap.add_argument("--gamma", type=float, default=2.2)
    ap.add_argument("--stats", action="store_true")
    ap.add_argument("--upscale", type=int, default=1, choices=(1, 2))
    ap.add_argument("--upscale-mode", default="spatial",
                    choices=("spatial", "temporal"),
                    help="temporal = ray-reconstruction mode "
                         "(reprojected history)")
    ap.add_argument("--upscaler-ckpt", default=None,
                    help="orbax checkpoint dir (scripts/train_upscaler)")
    ap.add_argument("--checkpoint", default=None,
                    help="npz frame-loop state to resume/save")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax_debug_nans (numeric race detector)")
    ap.add_argument("--two-level", action="store_true",
                    help="BLAS-per-mesh + TLAS traversal (instanced/"
                         "animated scenes; ref: Scene.cpp:163-254)")
    ap.add_argument("--devices", type=int, default=1,
                    help="render row-band-sharded over the first N "
                         "devices (full pipeline incl. denoise/upscale "
                         "under one multi-chip program)")
    ap.add_argument("--preview", action="store_true",
                    help="serve a live interactive viewer (WASD/arrow "
                         "camera, ref: Graphics/Camera.cpp:26-61) "
                         "instead of writing files")
    ap.add_argument("--port", type=int, default=8000,
                    help="preview server port")
    args = ap.parse_args(argv)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.config:
        cfg = CONFIGS[args.config]
    else:
        cfg = RenderConfig(width=args.width, height=args.height,
                           spp=args.spp, max_depth=args.max_depth,
                           sky=args.sky, indirect=args.indirect,
                           jitter=args.indirect, denoise=args.denoise,
                           upscale=args.upscale,
                           upscale_mode=args.upscale_mode,
                           traversal=args.traversal)

    from .frameloop import FrameLoop

    build_step("SCENE", 0, 2, f"Loading scene '{args.scene}'...")
    scene_obj = load_scene(args.scene)
    build_step("SCENE", 1, 2, "Building scene + acceleration structure...")
    up_params = None
    if args.upscaler_ckpt:
        from .models import upscaler as up_mod
        from .utils.checkpoint import load_params

        make = (up_mod.create_temporal if cfg.upscale_mode == "temporal"
                else up_mod.create)
        _, fresh, _ = make()
        up_params = load_params(args.upscaler_ckpt, fresh.params)
    mesh = None
    if args.devices > 1:
        from .parallel import tiles

        mesh = tiles.make_mesh(args.devices)
        logger.info("multi-chip mode: %d devices (%s)", args.devices,
                    jax.default_backend())
    loop = FrameLoop(scene_obj, cfg,
                     upscaler_params=up_params,
                     cull_threshold_px=1.0 if args.frames > 1 else 0.0,
                     two_level=args.two_level, mesh=mesh)
    scene = loop.scene
    if args.checkpoint and os.path.exists(args.checkpoint):
        loop.load_state(args.checkpoint)
        logger.info("resumed frame-loop state from %s (frame %d)",
                    args.checkpoint, loop.frame)
    build_step("SCENE", 2, 2, "Scene created!")

    stats = FrameStats()
    cam = Camera(position=tuple(args.camera[:3]),
                 rotation=tuple(args.camera[3:]))
    if args.preview:
        from .preview import run_preview

        run_preview(loop, cam, port=args.port, gamma=args.gamma,
                    max_frames=(args.frames if args.frames > 1
                                else None))
        return
    img = None
    for f in range(args.frames):
        if args.orbit:
            cam = orbit_camera(f * 0.15, radius=4.0, height=-1.0)
        t0 = time.perf_counter()
        img = jax.block_until_ready(loop.step(cam))
        dt = time.perf_counter() - t0
        if os.environ.get("HRT_KERNEL_GUARDS") == "1":
            from .ops.traversal_wide8 import check_pending_guards

            check_pending_guards()
        import bench as bench_mod

        stats.add(bench_mod.rays_per_frame(cfg, scene.lights.shape[0]), dt)
        if args.frames > 1:
            out = args.out.replace(".png", f"_{f:04d}.png")
        else:
            out = args.out
        write_png(out, tonemap(jax.device_get(img), gamma=args.gamma))
        logger.info("frame %d -> %s (%.1f ms)", f, out, dt * 1e3)

    if args.checkpoint:
        loop.save_state(args.checkpoint)
        logger.info("saved frame-loop state to %s", args.checkpoint)

    if args.stats:
        print(json.dumps({
            "frames": stats.frames,
            "ms_per_frame": round(stats.ms_per_frame, 2),
            "mrays_per_sec": round(stats.mrays_per_sec, 2),
        }))


if __name__ == "__main__":
    main()
