"""Benchmark harness: Mrays/sec on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (SURVEY.md section 6); vs_baseline is
measured against BASELINE.json's north-star target of 500 Mrays/sec/chip.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NORTH_STAR_MRAYS = 500.0


def build_bench_scene():
    from hrt_tpu.models.mesh import icosphere, plane
    from hrt_tpu.models.scene import Scene

    sc = Scene()
    sphere = sc.add_mesh(icosphere(3))          # 1280 tris
    ground = sc.add_mesh(plane(8.0))
    white = sc.create_material((0.8, 0.8, 0.8), 0.0, 0.8)
    metal = sc.create_material((0.9, 0.7, 0.3), 1.0, 0.15)
    sc.create_light((0.0, -4.0, -2.0), (1.0, 1.0, 1.0), 30.0)
    sc.create_light((3.0, -2.0, 2.0), (1.0, 0.8, 0.6), 15.0)
    sc.create_instance(ground, white, (0.0, 1.0, 0.0))
    sc.create_instance(sphere, metal, (0.0, 0.0, 0.0))
    sc.create_instance(sphere, white, (-2.0, 0.5, 1.0), scale=(0.5,) * 3)
    sc.create_instance(sphere, metal, (2.0, 0.5, -1.0), scale=(0.5,) * 3)
    return sc


def rays_per_frame(cfg, num_lights: int) -> int:
    """Count TraceRay-equivalent queries per frame: primary + shadow
    (+ bounce rays when indirect), mirroring how the reference's
    dispatch count would be measured."""
    n = cfg.width * cfg.height * cfg.spp
    per_bounce = 1 + num_lights  # closest hit + one shadow ray per light
    bounces = cfg.max_depth if cfg.indirect else 1
    return n * per_bounce * bounces


def main() -> None:
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.renderer import camera_arrays, render_frames

    cfg = RenderConfig(width=512, height=384, max_depth=1, sky=True,
                       traversal="auto")
    scene = build_bench_scene().build()
    cams = camera_arrays(Camera(position=(0.0, -1.0, -6.0),
                                rotation=(-0.15, 0.0, 0.0)), cfg)

    from hrt_tpu.ops import lbvh

    accel = lbvh.build_bvh_sah(scene, leaf_size=32)

    # Frames-in-flight: k frames per dispatch (renderer.render_frames)
    # amortizes the per-dispatch host round-trip (~30 ms through the
    # axon tunnel), like the reference's PERFORMANCE_TEST_MODE
    # uncapped-present loop (SwapChain.cpp:405-414).
    iters = 32

    # Warmup / compile.
    img = render_frames(scene, accel, cams, jnp.uint32(0), iters, cfg)
    jax.block_until_ready(img)

    # Best-of-batches: the tunneled chip shows ~2x run-to-run clock
    # variance, so take the fastest of several short batches.
    dt = float("inf")
    for b in range(4):
        t0 = time.perf_counter()
        img = render_frames(scene, accel, cams, jnp.uint32(b * iters),
                            iters, cfg)
        jax.block_until_ready(img)
        dt = min(dt, (time.perf_counter() - t0) / iters)

    mrays = rays_per_frame(cfg, scene.lights.shape[0]) / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/sec/chip",
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
