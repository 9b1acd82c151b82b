"""Multi-host render farm: frame-range sharding over DCN.

SURVEY.md section 2: DCN enters only for multi-host rendering, which is
embarrassingly parallel over frames.  Each host renders the frames
congruent to its process index; temporal state (accumulation, denoiser
history) stays host-local because each host owns a contiguous stride of
the animation only when stride == 1 — for denoised animations use
`chunked=True` so each host gets a contiguous frame block and its
temporal history remains valid.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import jax


@dataclasses.dataclass(frozen=True)
class FarmPlan:
    process_index: int
    process_count: int
    num_frames: int
    chunked: bool = True  # contiguous blocks (temporal-state friendly)

    def frames(self) -> Iterator[int]:
        if self.chunked:
            per = -(-self.num_frames // self.process_count)
            start = self.process_index * per
            yield from range(start, min(start + per, self.num_frames))
        else:
            yield from range(self.process_index, self.num_frames,
                             self.process_count)


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> FarmPlan:
    """Initialize multi-host JAX (no-op single-host when unconfigured)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return FarmPlan(process_index=jax.process_index(),
                    process_count=jax.process_count(), num_frames=0)


def render_frames(loop, camera_path: Callable[[int], object],
                  num_frames: int, on_frame: Callable[[int, object], None],
                  plan: FarmPlan | None = None) -> int:
    """Render this host's share of [0, num_frames) through a FrameLoop.

    camera_path(frame) -> Camera; on_frame(frame, image) consumes the
    result (e.g. write PNG).  Returns the number of frames rendered."""
    if plan is None:
        plan = FarmPlan(jax.process_index(), jax.process_count(),
                        num_frames)
    else:
        plan = dataclasses.replace(plan, num_frames=num_frames)
    count = 0
    for f in plan.frames():
        img = loop.step(camera_path(f))
        on_frame(f, img)
        count += 1
    return count
