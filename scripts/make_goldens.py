"""Generate golden reference frames (CPU backend, deterministic).

Writes tests/goldens/*.npz at 64x48 for a fixed set of configs
(SURVEY.md section 4 test plan item 3).  Regenerate only when an
intentional rendering change lands: python scripts/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def golden_cases():
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.models.scene import reference_demo_scene
    from hrt_tpu.models.scenefile import cornell_box

    small = dict(width=64, height=48)
    return {
        "demo_parity": (reference_demo_scene(), Camera(),
                        RenderConfig(max_depth=1, sky=False, **small)),
        "demo_sky": (reference_demo_scene(), Camera(),
                     RenderConfig(max_depth=1, sky=True, **small)),
        "bench_direct": (bench.build_bench_scene(),
                         Camera(position=(0, -1, -6),
                                rotation=(-0.15, 0, 0)),
                         RenderConfig(max_depth=1, sky=True,
                                      traversal="bvh", **small)),
        "cornell_gi": (cornell_box(), Camera(position=(0, 0, -3.2),
                                             fov_y=0.7),
                       RenderConfig(max_depth=3, indirect=True,
                                    traversal="bvh", **small)),
    }


def main():
    from hrt_tpu.renderer import render

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name, (scene, cam, cfg) in golden_cases().items():
        accel = None
        if cfg.traversal == "bvh":
            from hrt_tpu.ops import lbvh

            accel = lbvh.build_bvh(scene.build(), leaf_size=8)
        img = render(scene, cam, cfg, accel=accel)
        np.savez_compressed(os.path.join(out_dir, f"{name}.npz"),
                            image=np.asarray(img, np.float32))
        print(f"{name}: {img.shape} mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
