"""Train the learned 2x upscaler on self-supervised rendered frames.

Renders a few path-traced frames of the bench + cornell scenes, then
optimizes the residual CNN to reconstruct full-res frames from 2x
downsamples (models/upscaler.py).  Saves weights with orbax to
checkpoints/upscaler (FrameLoop picks them up via --upscaler-ckpt).

Usage: python scripts/train_upscaler.py [--steps 300] [--frames 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def render_training_frames(n_frames: int, size=(256, 256)):
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.frameloop import FrameLoop
    from hrt_tpu.models.camera import orbit_camera
    from hrt_tpu.models.scenefile import cornell_box

    frames = []
    for scene_obj, radius, height in (
        (bench.build_bench_scene(), 6.0, -1.5),
        (cornell_box(), 2.8, 0.0),
    ):
        cfg = RenderConfig(width=size[0], height=size[1], max_depth=3,
                           indirect=True, jitter=True, sky=True,
                           traversal="pallas")
        loop = FrameLoop(scene_obj, cfg, cull_threshold_px=0.0)
        for f in range(n_frames // 2):
            cam = orbit_camera(0.4 * f, radius=radius, height=height)
            frames.append(np.asarray(loop.step(cam)))
    return jnp.asarray(np.stack(frames))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="checkpoints/upscaler")
    args = ap.parse_args()

    from hrt_tpu.models import upscaler
    from hrt_tpu.utils.checkpoint import save_params

    print("rendering training frames...")
    frames = render_training_frames(args.frames)
    print("frames:", frames.shape)

    net, state, tx = upscaler.create(lr=2e-3)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        lr_b, hr_b = upscaler.self_supervised_batch(frames, sub,
                                                    crop=64, batch=8)
        state, loss = upscaler.train_step(state, net, tx, lr_b, hr_b)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)")

    save_params(os.path.abspath(args.out), state.params)
    print("saved to", args.out)


if __name__ == "__main__":
    main()
