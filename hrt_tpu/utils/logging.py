"""Structured build/frame logging.

The TPU-side analogue of the reference's BUILD()/DEBUG() stdout macros
(ref: Graphics/RayTracing/Debugging.h:5-6, used through Scene.cpp:101-119
and RTPipeline.cpp:11-25): step-progress logs plus per-frame stats.
"""
from __future__ import annotations

import logging
import time
from contextlib import contextmanager

logger = logging.getLogger("hrt_tpu")
if not logger.handlers:
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("[%(name)s] %(levelname)s %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)


def build_step(name: str, step: int, count: int, msg: str) -> None:
    """ref: BUILD(name, step, count, msg) (Debugging.h:6)."""
    logger.info("[%s %d/%d] %s", name, step, count, msg)


@contextmanager
def timed(label: str):
    t0 = time.perf_counter()
    yield
    logger.info("%s: %.2f ms", label, (time.perf_counter() - t0) * 1e3)


class FrameStats:
    """Per-frame counters (rays traced, active-ray histogram, timings)."""

    def __init__(self):
        self.frames = 0
        self.rays = 0
        self.seconds = 0.0

    def add(self, rays: int, seconds: float) -> None:
        self.frames += 1
        self.rays += rays
        self.seconds += seconds

    @property
    def mrays_per_sec(self) -> float:
        return self.rays / max(self.seconds, 1e-9) / 1e6

    @property
    def ms_per_frame(self) -> float:
        return self.seconds / max(self.frames, 1) * 1e3
