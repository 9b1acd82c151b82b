"""Live preview: camera-controller parity + HTTP server round-trip.

The controller math mirrors the reference's handleInputs
(ref: Graphics/Camera.cpp:26-61); the server test exercises the real
HTTP surface (frame fetch, key POST, viewer page) against a stub frame
source — no TPU needed.
"""
import json
import math
import urllib.request

import numpy as np

from hrt_tpu.preview import (CameraController, LOOK_SPEED, MOVE_SPEED,
                             PITCH_CLAMP, PreviewServer)


def test_controller_move_forward_along_yaw():
    c = CameraController(position=(0, 0, 0), rotation=(0, 0.5, 0))
    c.step({"w"}, 0.25)
    # forward = (sin(yaw), 0, cos(yaw)) at 3 units/s (Camera.cpp:42,59)
    exp = (math.sin(0.5) * MOVE_SPEED * 0.25, 0.0,
           math.cos(0.5) * MOVE_SPEED * 0.25)
    assert np.allclose(c.position, exp, atol=1e-12)


def test_controller_diagonal_is_normalized():
    c = CameraController(position=(0, 0, 0), rotation=(0, 0, 0))
    c.step({"w", "d"}, 1.0)
    # |move| == MOVE_SPEED * dt regardless of key count
    assert np.isclose(np.linalg.norm(c.position), MOVE_SPEED)


def test_controller_up_is_negative_y():
    c = CameraController(position=(0, 0, 0))
    c.step({"e"}, 1.0)
    assert np.allclose(c.position, (0, -MOVE_SPEED, 0))
    c.step({"q"}, 1.0)
    assert np.allclose(c.position, (0, 0, 0), atol=1e-12)


def test_controller_look_rates_and_clamps():
    c = CameraController()
    c.step({"arrowright"}, 0.5)
    assert np.isclose(c.rotation[1], LOOK_SPEED * 0.5)
    # pitch clamps at +-1.5 (Camera.cpp:41)
    for _ in range(10):
        c.step({"arrowup"}, 1.0)
    assert c.rotation[0] == PITCH_CLAMP
    # yaw wraps mod 2*pi (Camera.cpp:42)
    for _ in range(10):
        c.step({"arrowright"}, 1.0)
    assert 0.0 <= c.rotation[1] < 2.0 * math.pi


def test_controller_simultaneous_look_normalized():
    c = CameraController()
    c.step({"arrowup", "arrowright"}, 1.0)
    mag = math.sqrt(c.rotation[0] ** 2 + c.rotation[1] ** 2)
    assert np.isclose(mag, LOOK_SPEED)


def test_preview_server_roundtrip():
    srv = PreviewServer(port=0)  # ephemeral port
    try:
        url = f"http://127.0.0.1:{srv.port}"
        # No frame yet -> 503
        try:
            urllib.request.urlopen(f"{url}/frame.png", timeout=5)
            assert False, "expected 503 before first publish"
        except urllib.error.HTTPError as e:
            assert e.code == 503
        # Publish + fetch
        frame = np.zeros((8, 8, 3), np.uint8)
        frame[2, 3] = (255, 0, 0)
        srv.publish(frame)
        data = urllib.request.urlopen(f"{url}/frame.png",
                                      timeout=5).read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        from PIL import Image
        import io

        arr = np.asarray(Image.open(io.BytesIO(data)))
        assert arr.shape[:2] == (8, 8) and tuple(arr[2, 3][:3]) == (
            255, 0, 0)
        # Key POST updates the held set
        req = urllib.request.Request(
            f"{url}/keys", data=json.dumps({"keys": ["W", "ArrowUp"]})
            .encode(), method="POST")
        assert urllib.request.urlopen(req, timeout=5).status == 204
        assert srv.held_keys == {"w", "arrowup"}
        # Viewer page serves
        page = urllib.request.urlopen(url + "/", timeout=5).read()
        assert b"hrt_tpu" in page and b"/frame.png" in page
    finally:
        srv.close()


def test_run_preview_with_frameloop_cpu():
    """End-to-end: a tiny FrameLoop on CPU through run_preview with a
    frame budget (the CLI --preview path minus the browser)."""
    import threading

    import jax

    from hrt_tpu.config import RenderConfig
    from hrt_tpu.frameloop import FrameLoop
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.models.scene import reference_demo_scene
    from hrt_tpu import preview as pv

    cfg = RenderConfig(width=64, height=48, max_depth=1, sky=True,
                       traversal="bvh")
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0.0)
    cam = Camera(position=(0, 0, -2))

    captured = {}
    orig_init = pv.PreviewServer.__init__

    def patched(self, host="127.0.0.1", port=0):
        orig_init(self, "127.0.0.1", 0)
        captured["srv"] = self

    pv.PreviewServer.__init__ = patched
    try:
        t = threading.Thread(
            target=pv.run_preview,
            kwargs=dict(loop=loop, camera=cam, max_frames=3))
        t.start()
        t.join(timeout=120)
        assert not t.is_alive()
        srv = captured["srv"]
        assert srv._frame_png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        pv.PreviewServer.__init__ = orig_init


def test_resize_endpoint_roundtrip():
    """POST /resize queues one (w, h) request; take_resize pops it."""
    srv = PreviewServer(port=0)
    try:
        url = f"http://127.0.0.1:{srv.port}"
        assert srv.take_resize() is None
        req = urllib.request.Request(
            f"{url}/resize", data=json.dumps({"size": "512x384"})
            .encode(), method="POST")
        assert urllib.request.urlopen(req, timeout=5).status == 204
        assert srv.take_resize() == (512, 384)
        assert srv.take_resize() is None       # popped
        # width/height form + garbage are accepted/ignored.
        for body, want in (({"width": 64, "height": 48}, (64, 48)),
                           ({"size": "keep"}, None),
                           ({"size": "0x0"}, None)):
            req = urllib.request.Request(
                f"{url}/resize", data=json.dumps(body).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=5)
            assert srv.take_resize() == want
    finally:
        srv.close()


def test_run_preview_applies_resize():
    """A queued resize request changes the next frame's size."""
    import threading

    from hrt_tpu.config import RenderConfig
    from hrt_tpu.frameloop import FrameLoop
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.models.scene import reference_demo_scene
    from hrt_tpu import preview as pv

    cfg = RenderConfig(width=64, height=48, max_depth=1, sky=True,
                       traversal="bvh")
    loop = FrameLoop(reference_demo_scene(), cfg, cull_threshold_px=0.0)
    cam = Camera(position=(0, 0, -2))

    captured = {}
    orig_init = pv.PreviewServer.__init__

    def patched(self, host="127.0.0.1", port=0):
        orig_init(self, "127.0.0.1", 0)
        self._resize = (96, 64)     # pre-queued resize
        captured["srv"] = self

    pv.PreviewServer.__init__ = patched
    try:
        t = threading.Thread(
            target=pv.run_preview,
            kwargs=dict(loop=loop, camera=cam, max_frames=2))
        t.start()
        t.join(timeout=120)
        assert not t.is_alive()
    finally:
        pv.PreviewServer.__init__ = orig_init
    assert (loop.config.width, loop.config.height) == (96, 64)
    from PIL import Image
    import io

    arr = np.asarray(Image.open(io.BytesIO(captured["srv"]._frame_png)))
    assert arr.shape[:2] == (64, 96)
