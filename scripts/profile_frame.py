"""Per-op DEVICE-time profile of the bench frame (xprof xplane parse).

Wall-clock through the axon tunnel is inflated 4-5x; this script
aggregates event.duration_ps on the '/device:TPU:0' plane instead
(CLAUDE.md recipe — the tensorboard plugin converter is broken against
this TF install, so we parse the xplane protobuf directly).

Usage: python scripts/profile_frame.py [--frames N] [--top K]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(frames: int, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_bench_scene
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.ops import lbvh
    from hrt_tpu.renderer import camera_arrays, render_frame

    import dataclasses
    which = os.environ.get("HRT_PROFILE_CFG", "bench")
    if which == "4k":
        # The animated_4k_upscaled BENCH_FULL config, through FrameLoop
        # (denoise + temporal upscale are the interesting stages here).
        from hrt_tpu.frameloop import FrameLoop

        cfg = RenderConfig(width=1920, height=1080, max_depth=3,
                           sky=True, indirect=True, jitter=True,
                           denoise=True, sort_bounces=True, upscale=2,
                           traversal="pallas")
        loop = FrameLoop(build_bench_scene(), cfg, cull_threshold_px=0.0)
        cam = Camera(position=(0.0, -1.0, -6.0), rotation=(-0.15, 0, 0))
        jax.block_until_ready(loop.step(cam))
        jax.profiler.start_trace(trace_dir)
        for _ in range(frames):
            img = loop.step(cam)
        jax.block_until_ready(img)
        jax.profiler.stop_trace()
        return
    if which == "path1080":
        cfg = RenderConfig(width=1920, height=1080, max_depth=5,
                           sky=True, indirect=True, jitter=True,
                           accumulate=True, sort_bounces=True,
                           traversal="pallas")
    else:
        cfg = RenderConfig(width=512, height=384, max_depth=1, sky=True,
                           traversal="auto")
    if os.environ.get("HRT_PROFILE_SORT"):
        cfg = dataclasses.replace(
            cfg, sort_bounces=bool(int(os.environ["HRT_PROFILE_SORT"])))
    if os.environ.get("HRT_PROFILE_SFL") == "0":
        cfg = dataclasses.replace(cfg, shadow_from_light=False)
    elif os.environ.get("HRT_PROFILE_SFL") == "1":
        cfg = dataclasses.replace(cfg, shadow_from_light=True)
    scene = build_bench_scene().build()
    cams = camera_arrays(Camera(position=(0.0, -1.0, -6.0),
                                rotation=(-0.15, 0.0, 0.0)), cfg)
    accel = lbvh.build_bvh_sah(scene, leaf_size=32)

    img = render_frame(scene, accel, cams, jnp.uint32(0), cfg)
    jax.block_until_ready(img)

    jax.profiler.start_trace(trace_dir)
    for i in range(frames):
        img = render_frame(scene, accel, cams, jnp.uint32(i), cfg)
    jax.block_until_ready(img)
    jax.profiler.stop_trace()


def aggregate(trace_dir: str, frames: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    path = paths[-1]
    data = open(path, "rb").read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    space = xplane_pb2.XSpace()
    space.ParseFromString(data)

    for plane in space.planes:
        if "TPU" not in plane.name or "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = collections.Counter()
        counts = collections.Counter()
        # NOTE exact match: the 'Async XLA Ops' line overlaps compute and
        # must not be summed with the serialized 'XLA Ops' line.
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps
                counts[name] += 1
        if not totals:  # fall back: take all lines
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    totals[name] += ev.duration_ps
                    counts[name] += 1
        total_ms = sum(totals.values()) / 1e9
        print(f"\n== {plane.name} | total device {total_ms:.3f} ms "
              f"({total_ms / frames:.3f} ms/frame over {frames} frames)")
        print(f"{'op':60s} {'ms/frame':>9s} {'%':>6s} {'n/frame':>8s}")
        for name, ps in totals.most_common(top):
            ms = ps / 1e9 / frames
            pct = 100.0 * ps / sum(totals.values())
            print(f"{name[:60]:60s} {ms:9.4f} {pct:6.1f} "
                  f"{counts[name] / frames:8.1f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dir", default="/tmp/hrt_profile")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        import shutil

        shutil.rmtree(args.dir, ignore_errors=True)
        capture(args.frames, args.dir)
    aggregate(args.dir, args.frames, args.top)


if __name__ == "__main__":
    main()
