"""Render-farm frame sharding (single-host degenerate behavior)."""
import numpy as np

from hrt_tpu.config import RenderConfig
from hrt_tpu.frameloop import FrameLoop
from hrt_tpu.models.camera import orbit_camera
from hrt_tpu.models.scene import reference_demo_scene
from hrt_tpu.parallel.farm import FarmPlan, render_frames


def test_farm_plan_partitions_exactly():
    frames = 11
    seen = []
    for p in range(3):
        plan = FarmPlan(p, 3, frames, chunked=True)
        seen += list(plan.frames())
    assert sorted(seen) == list(range(frames))

    seen = []
    for p in range(3):
        plan = FarmPlan(p, 3, frames, chunked=False)
        seen += list(plan.frames())
    assert sorted(seen) == list(range(frames))


def test_farm_chunked_blocks_are_contiguous():
    plan = FarmPlan(1, 4, 16, chunked=True)
    assert list(plan.frames()) == [4, 5, 6, 7]


def test_render_frames_through_loop():
    cfg = RenderConfig(width=32, height=24, max_depth=1, sky=True,
                       traversal="bvh")
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)
    got = {}

    def on_frame(f, img):
        got[f] = np.asarray(img)

    n = render_frames(loop, lambda f: orbit_camera(f * 0.3), 4, on_frame,
                      plan=FarmPlan(0, 2, 4))
    assert n == 2
    assert sorted(got) == [0, 1]
    assert all(np.isfinite(v).all() for v in got.values())
