"""Utility coverage: image IO/metrics, profiling, logging, CLI smoke."""
import json
import os

import numpy as np
import jax.numpy as jnp

from hrt_tpu.utils import image, profiling
from hrt_tpu.utils.logging import FrameStats


def test_tonemap_ranges():
    hdr = np.asarray([[[0.0, 0.5, 2.0]]], np.float32)
    out = image.tonemap(hdr, gamma=1.0)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, 0], [0, 128, 255])


def test_png_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (8, 8, 3)).astype(np.uint8)
    p = os.path.join(tmp_path, "t.png")
    image.write_png(p, img)
    from PIL import Image

    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_psnr_ssim():
    a = np.full((16, 16, 3), 0.5, np.float32)
    assert image.psnr(a, a) == float("inf")
    assert image.ssim(a, a) > 0.99
    noisy = a + np.random.RandomState(1).normal(0, 0.1, a.shape)
    assert 10 < image.psnr(a, noisy) < 30


def test_frame_stats():
    st = FrameStats()
    st.add(1_000_000, 0.01)
    st.add(1_000_000, 0.01)
    assert abs(st.mrays_per_sec - 100.0) < 1e-6
    assert abs(st.ms_per_frame - 10.0) < 1e-6


def test_stage_timer():
    timer = profiling.StageTimer()
    with timer.stage("trace"):
        _ = jnp.zeros(4) + 1
    rep = timer.report()
    assert "trace" in rep and rep["trace"] >= 0


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)


def test_cli_smoke(tmp_path, capsys):
    from hrt_tpu.cli import main

    out = os.path.join(tmp_path, "f.png")
    ckpt = os.path.join(tmp_path, "state.npz")
    main(["--scene", "demo", "--out", out, "--width", "32",
          "--height", "24", "--max-depth", "1", "--sky",
          "--traversal", "bvh", "--stats", "--checkpoint", ckpt])
    assert os.path.exists(out)
    assert os.path.exists(ckpt)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 1


def test_cli_resume(tmp_path):
    from hrt_tpu.cli import main

    out = os.path.join(tmp_path, "f.png")
    ckpt = os.path.join(tmp_path, "state.npz")
    args = ["--scene", "demo", "--out", out, "--width", "32",
            "--height", "24", "--max-depth", "1", "--traversal", "bvh",
            "--checkpoint", ckpt]
    main(args)
    main(args)  # resumes from frame 1
    import numpy as np_

    state = np_.load(ckpt)
    assert int(state["frame"]) == 2
