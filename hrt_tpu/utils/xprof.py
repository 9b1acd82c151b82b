"""xprof DEVICE-time measurement (the trustworthy benchmark clock).

Wall-clock through the axon tunnel is inflated 4-5x with ~30%
run-to-run variance (CLAUDE.md); the xplane '/device:TPU:0' totals are
stable.  This is the library form of scripts/profile_frame.py's parse —
the tensorboard plugin's trace converter is broken against this TF
install, so the xplane protobuf is read directly.

The reference has no counterpart (it reads swapchain FPS); the analogue
of these numbers is a Nsight/RGP GPU-time capture.
"""
from __future__ import annotations

import collections
import glob
import gzip
import os
import shutil
from typing import Callable

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse_device_totals(trace_dir: str):
    """-> (total_device_ms, Counter op-name -> ps) for the TPU plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    data = open(paths[-1], "rb").read()
    if paths[-1].endswith(".gz"):
        data = gzip.decompress(data)
    space = xplane_pb2.XSpace()
    space.ParseFromString(data)

    for plane in space.planes:
        if "TPU" not in plane.name or "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = collections.Counter()
        # Exact match: the 'Async XLA Ops' line overlaps compute and
        # must not be summed with the serialized 'XLA Ops' line.
        lines = [l for l in plane.lines if l.name == "XLA Ops"]
        if not lines:
            lines = plane.lines
        for line in lines:
            for ev in line.events:
                totals[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps
        return sum(totals.values()) / 1e9, totals
    raise RuntimeError("no TPU device plane in trace")


def device_ms_per_call(fn: Callable[[], object], calls: int = 8,
                       trace_dir: str = "/tmp/hrt_xprof") -> float:
    """Run fn() `calls` times under a profiler trace; return the mean
    DEVICE ms per call.  fn must be pre-compiled (call it once before)
    so compile time never lands inside the trace."""
    import jax

    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.block_until_ready(fn())  # warm/compile outside the trace
    jax.profiler.start_trace(trace_dir)
    out = None
    for _ in range(calls):
        out = fn()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    total_ms, _ = parse_device_totals(trace_dir)
    return total_ms / calls
