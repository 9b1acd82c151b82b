"""2-process jax.distributed smoke of the render farm (VERDICT r3 #6).

Exercises the `jax.distributed.initialize` branch of
hrt_tpu.parallel.farm.initialize for real: two OS processes rendezvous
at a local coordinator, each renders its chunk of a tiny animation on
the CPU backend, and the parent checks the union covers every frame
exactly once.  This is the DCN multi-host path of SURVEY.md section 2
("multi-host render farms, frame-range sharding") scaled down to one
box — the same code path a real farm runs, minus the network.
"""
import os
import socket
import subprocess
import sys
import tempfile
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from hrt_tpu.config import RenderConfig
    from hrt_tpu.frameloop import FrameLoop
    from hrt_tpu.models.camera import orbit_camera
    from hrt_tpu.models.scene import reference_demo_scene
    from hrt_tpu.parallel import farm

    coord, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    plan = farm.initialize(coordinator=coord, num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert plan.process_index == pid, plan

    cfg = RenderConfig(width=32, height=24, max_depth=1, sky=True,
                       traversal="bvh")
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0)

    def on_frame(f, img):
        np.save(os.path.join(out_dir, f"frame_{f:03d}_p{pid}.npy"),
                np.asarray(img))

    n = farm.render_frames(loop, lambda f: orbit_camera(f * 0.3),
                           6, on_frame, plan=plan)
    print(f"worker {pid}: rendered {n} frames", flush=True)
    jax.distributed.shutdown()
""")


@pytest.mark.slow
def test_farm_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "farm_worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # One device per process: the virtual-device flag would make each
    # process advertise 8 local devices, which is fine but slower.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("PYTEST_CURRENT_TEST", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("farm worker timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    done = sorted(f.name for f in tmp_path.glob("frame_*.npy"))
    frames = sorted(int(n.split("_")[1]) for n in done)
    assert frames == list(range(6)), (frames, outs)
    # Chunked plan: process 0 owns [0, 3), process 1 owns [3, 6).
    owners = {int(n.split("_")[1]): int(n.split("_p")[1][0]) for n in done}
    assert owners == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    for f in tmp_path.glob("frame_*.npy"):
        assert np.isfinite(np.load(f)).all()
