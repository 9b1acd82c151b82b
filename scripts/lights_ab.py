"""A/B: light-BVH vs flat-CDF many-light NEE at 256 lights.

VERDICT r4 #6: prove the O(log L) light-BVH descent against the O(L)
flat-CDF weight scan at a light count where the scan should hurt
(both samplers pick config.light_samples lights per shading point;
the trace cost is identical — the delta is pure sampler overhead).
Single process; one jit specialization per sampler.

Usage: python scripts/lights_ab.py [n_lights] [reps]
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n_lights = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax

    from scripts.bench_full import _many_lights_scene
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.ops import lbvh
    from hrt_tpu.renderer import camera_arrays, render_frame
    from hrt_tpu.utils import xprof
    import jax.numpy as jnp

    scene = _many_lights_scene(n_lights).build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=32)
    cam = Camera(position=(0, -1, -6), rotation=(-0.15, 0, 0))
    base = RenderConfig(width=512, height=384, max_depth=1, sky=True,
                        light_samples=2, traversal="pallas")
    cams = camera_arrays(cam, base)

    out_ms = {}
    for sampler in ("bvh", "cdf"):
        cfg = dataclasses.replace(base, light_sampler=sampler)

        def call():
            return render_frame(scene, accel, cams, jnp.uint32(1), cfg)

        jax.block_until_ready(call())
        for rep in range(reps):
            dev_ms = xprof.device_ms_per_call(call, calls=4)
            out_ms.setdefault(sampler, []).append(dev_ms)
            print(json.dumps({"sampler": sampler, "rep": rep,
                              "lights": n_lights,
                              "device_ms": round(dev_ms, 3)}),
                  flush=True)
    print("== best-of-reps ==")
    for name, vals in out_ms.items():
        print(f"{name:4s} {min(vals):8.3f} ms")


if __name__ == "__main__":
    main()
