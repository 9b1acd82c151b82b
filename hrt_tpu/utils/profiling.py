"""Profiling & observability.

The reference has no profiling beyond a frame delta-time
(ref: RTApp.cpp:35-37) and an uncapped-present PERFORMANCE_TEST_MODE
(ref: SwapChain.cpp:405-414).  Here: jax.profiler trace capture around
frames, per-stage wall timers, and a per-frame stats dict (rays traced,
active-ray histogram, Mrays/s) — SURVEY.md section 5.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from .logging import logger


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hrt_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StageTimer:
    """Wall-clock per-stage timers with block_until_ready fencing."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, float]:
        return {k: round(v * 1e3 / max(self.counts[k], 1), 3)
                for k, v in self.totals.items()}


def frame_stats(config, num_lights: int, seconds: float) -> dict:
    """Per-frame counter dict (the structured analogue of the
    reference's ad-hoc stdout logging)."""
    import bench

    rays = bench.rays_per_frame(config, num_lights)
    return {
        "rays": rays,
        "ms": round(seconds * 1e3, 3),
        "mrays_per_sec": round(rays / max(seconds, 1e-9) / 1e6, 2),
        "resolution": [config.width, config.height],
        "spp": config.spp,
        "max_depth": config.max_depth,
    }


def device_memory_stats() -> dict:
    """HBM usage snapshot for the default device (when supported)."""
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except (AttributeError, NotImplementedError):
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats.get(k) for k in keys if stats and k in stats}
