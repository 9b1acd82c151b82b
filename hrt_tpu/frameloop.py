"""Frame loop: the full quality pipeline as one jitted program.

North star (BASELINE.json): `trace -> shade -> denoise -> upscale` in a
single XLA program per frame.  This module is the TPU analogue of
RTApp::run()'s per-frame work (ref: Graphics/RayTracing/RTApp.cpp:29-85)
with the swapchain replaced by explicit state pytrees:

- temporal accumulation buffer (the reference's `Uniform::frame`
  counter is the seed; ref: RTPipeline.h:24-30, RTApp.cpp:47);
- SVGF history (ops/denoise.DenoiseState);
- instance visibility for the Smart-Culling pre-pass (ops/culling.py),
  which triggers an LBVH rebuild when visibility changes;
- optional learned 2x upscaler parameters (models/upscaler.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig
from .models.camera import Camera
from .models.scene import Scene, SceneData
from .ops import culling, denoise, lbvh
from .renderer import CameraArrays, camera_arrays, render_rows


def _wants_gbuffer(config: RenderConfig, up_history) -> bool:
    temporal_up = (config.upscale == 2
                   and config.upscale_mode == "temporal"
                   and up_history is not None)
    return config.denoise or temporal_up


def _post_stages(img, gbuffer, prev_cams, dn_state, accum, frame,
                 config: RenderConfig, net, up_params, up_history,
                 pallas_warp: bool = True):
    """accumulate -> denoise -> upscale, shared by the single-chip and
    tile-sharded frame programs (parallel/tiles.frame_program_tiled
    runs this on row-sharded arrays and lets XLA's sharding propagation
    partition the stencils/convs — halo exchange is the compiler's
    job, not hand-written collectives)."""
    w, h = config.width, config.height
    temporal_up = (config.upscale == 2
                   and config.upscale_mode == "temporal"
                   and up_history is not None)
    if config.accumulate:
        n = jnp.minimum(frame.astype(jnp.float32), 10000.0)
        accum = (accum * n + img) / (n + 1.0)
        img = accum

    if config.denoise:
        img, dn_state = denoise.svgf(dn_state, img, gbuffer, prev_cams,
                                     w, h, pallas_warp=pallas_warp)

    if config.upscale == 2 and net is not None and up_params is not None:
        from .models import upscaler

        if temporal_up:
            hist = upscaler.reproject_history(
                up_history, gbuffer["world_pos"], gbuffer["hit"],
                prev_cams, w, h, pallas_warp=pallas_warp)
            # Frame 0 (and right after reset()): up_history is all-zero
            # and prev_cams == cams, so reprojection would mark hit
            # pixels "valid" and blend toward black — out of
            # distribution for the net (training corruption zeroes
            # validity WITH the rgb).  Gate validity by frame > 0,
            # matching upscaler.eval_temporal's t == 0 handling.
            hist = jnp.concatenate(
                [hist[..., :3],
                 jnp.where(frame > 0, hist[..., 3:4], 0.0)], axis=-1)
            img = upscaler.upscale_temporal(net, up_params, img, hist)
            up_history = img
        else:
            img = upscaler.upscale(net, up_params, img)

    return img, dn_state, accum, up_history


@functools.partial(jax.jit, static_argnames=("config", "net"))
def frame_program(scene: SceneData, accel, cams: CameraArrays,
                  prev_cams: CameraArrays, dn_state, accum, frame,
                  config: RenderConfig, net=None, up_params=None,
                  up_history=None):
    """One fused frame: returns (output image, new denoise state,
    new accumulation buffer, new upscaler history)."""
    h = config.height
    want_gb = _wants_gbuffer(config, up_history)
    out = render_rows(scene, accel, cams, frame, 0, h, config,
                      want_gbuffer=want_gb)
    img, gbuffer = out if want_gb else (out, None)
    return _post_stages(img, gbuffer, prev_cams, dn_state, accum,
                        frame, config, net, up_params, up_history)


@dataclasses.dataclass
class FrameLoop:
    """Host-side driver holding cross-frame state (RTApp::run analogue).

    Usage:
        loop = FrameLoop(scene, config)
        img = loop.step(camera)          # one frame, state advances
    """

    scene_obj: Any
    config: RenderConfig
    upscaler_params: Optional[Any] = None
    cull_threshold_px: float = 1.0
    two_level: bool = False
    # Multi-chip render mode: a jax.sharding.Mesh with a 'tiles' axis.
    # The full pipeline (incl. denoise/upscale) runs row-band-sharded
    # over it (parallel/tiles.frame_program_tiled); scene + BVH are
    # replicated.  CLI: --devices N.
    mesh: Optional[Any] = None

    def __post_init__(self):
        cfg = self.config
        self.scene: SceneData = (
            self.scene_obj.build() if isinstance(self.scene_obj, Scene)
            else self.scene_obj)
        # K=32 leaf blocks: the wide8 kernel is crossing-bound on
        # coherent passes -- fewer, fatter leaves win (round-3:
        # closest 0.51 -> 0.46 ms; K=64 loses 4x to Moller waste).
        # K=16 was re-measured for the incoherent bounce regime under
        # the round-5 6-D Morton sort and LOSES (31.3 vs 28.3 ms:
        # visits go 46 -> 74/tile and the extra crossings eat the
        # 26% Moller saving), so 32 stays for indirect configs too.
        self.leaf_size = cfg.leaf_size or 32
        self.visible = jnp.ones(
            (self.scene.inst_bmin.shape[0],), bool)
        if self.two_level:
            # BLAS-per-mesh + TLAS (the reference's Scene::build split,
            # Scene.cpp:163-254): instance transforms refit per frame
            # without any BLAS rebuild (set_instance_transform).
            if not isinstance(self.scene_obj, Scene):
                raise ValueError("two_level needs the authoring Scene")
            from .ops import tlas

            self.accel = tlas.build_two_level_flat(self.scene_obj,
                                                   self.leaf_size)
        else:
            # Static scenes get the high-quality native SAH tree;
            # culling rebuilds use the fast on-device LBVH.  Both carry
            # the sublane-record BVH8 table (lbvh.attach_wide8) — the
            # fastest traversal path.
            self.accel = (lbvh.build_bvh_sah(self.scene, self.leaf_size)
                          if cfg.traversal != "bruteforce" else None)
        if self.mesh is not None:
            from .parallel import tiles

            self.scene = tiles.replicate(self.scene, self.mesh)
            if self.accel is not None:
                self.accel = tiles.replicate(self.accel, self.mesh)
        self.dn_state = denoise.init_state(cfg.height, cfg.width)
        self.accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        self.frame = 0
        self.prev_cams: Optional[CameraArrays] = None
        self.net = None
        self.up_history = None
        if cfg.upscale == 2:
            from .models import upscaler

            if cfg.upscale_mode == "temporal":
                self.net, state, _ = upscaler.create_temporal()
                self.up_history = jnp.zeros(
                    (2 * cfg.height, 2 * cfg.width, 3), jnp.float32)
            else:
                self.net, state, _ = upscaler.create()
            if self.upscaler_params is None:
                self.upscaler_params = state.params

    def reset_history(self):
        cfg = self.config
        self.dn_state = denoise.init_state(cfg.height, cfg.width)
        self.accum = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        self.frame = 0
        if self.up_history is not None:
            self.up_history = jnp.zeros_like(self.up_history)

    def set_resolution(self, width: int, height: int) -> None:
        """Switch render resolution mid-session (the reference
        recreates its swapchain on live resize and keeps rendering,
        RTApp.cpp:214-232 / SwapChain.cpp:133).  Scene + BVH are
        resolution-independent and survive; the size-dependent state
        (denoise history, accumulation, upscaler history) is rebuilt
        and temporal history restarts — exactly what a swapchain
        recreation does to the reference's frame resources.  A shape
        rendered before (or prewarmed via scripts/prewarm.py) hits the
        jit/persistent-compilation cache, so the switch is seconds, not
        a fresh Mosaic compile."""
        if (width, height) == (self.config.width, self.config.height):
            return
        self.config = dataclasses.replace(self.config,
                                          width=width, height=height)
        self.prev_cams = None
        self.up_history = (None if self.up_history is None else
                           jnp.zeros((2 * height, 2 * width, 3),
                                     jnp.float32))
        self.reset_history()

    def set_instance_transform(self, idx: int, position=None,
                               rotation=None, scale=None) -> None:
        """Animate one instance (two-level mode): update its TRS and
        refit the TLAS on device — no BLAS rebuild (ref: the TLAS
        UPDATE path the reference's PREFER_FAST_TRACE build implies)."""
        if not self.two_level:
            raise ValueError("instance animation needs two_level=True")
        from .models.instance import MeshInstance
        from .ops import tlas

        cur = self.scene_obj.instances[idx]
        self.scene_obj.instances[idx] = MeshInstance(
            cur.mesh_id, cur.material_id,
            tuple(position) if position is not None else cur.position,
            tuple(rotation) if rotation is not None else cur.rotation,
            tuple(scale) if scale is not None else cur.scale)
        insts = self.scene_obj.instances
        w = jnp.asarray(np.stack([i.transform for i in insts]))
        ow = jnp.asarray(np.stack([i.inverse_transform for i in insts]))
        nm = jnp.asarray(np.stack([i.normal_matrix for i in insts]))
        self.accel = tlas.refit_two_level(self.accel, w, ow, nm)

    def _maybe_cull(self, cams: CameraArrays):
        if (self.accel is None or self.cull_threshold_px <= 0
                or self.two_level):
            return
        new_vis = culling.cull_instances(
            self.visible, self.scene.inst_bmin, self.scene.inst_bmax,
            cams, self.config.width, self.config.height,
            threshold_px=self.cull_threshold_px)
        if bool(jnp.any(new_vis != self.visible)):
            self.visible = new_vis
            mask = culling.triangle_mask(new_vis, self.scene.tri_inst,
                                         self.scene.tri_valid)
            self.accel = lbvh.build_bvh(self.scene, self.leaf_size,
                                        tri_mask=mask)

    def step(self, camera: Camera) -> np.ndarray:
        """Render the next frame; returns the final (possibly upscaled)
        image as a device array."""
        cams = camera_arrays(camera, self.config)
        if self.prev_cams is None:
            self.prev_cams = cams
        self._maybe_cull(cams)
        if self.mesh is not None:
            from .parallel.tiles import frame_program_tiled

            img, self.dn_state, self.accum, self.up_history = \
                frame_program_tiled(
                    self.scene, self.accel, cams, self.prev_cams,
                    self.dn_state, self.accum, jnp.uint32(self.frame),
                    self.config, self.mesh, net=self.net,
                    up_params=self.upscaler_params,
                    up_history=self.up_history)
        else:
            img, self.dn_state, self.accum, self.up_history = \
                frame_program(
                    self.scene, self.accel, cams, self.prev_cams,
                    self.dn_state, self.accum, jnp.uint32(self.frame),
                    self.config, net=self.net,
                    up_params=self.upscaler_params,
                    up_history=self.up_history)
        self.prev_cams = cams
        self.frame += 1
        return img

    # ---- checkpoint / resume (SURVEY.md section 5) -------------------
    def save_state(self, path: str) -> None:
        extra = ({"up_history": np.asarray(self.up_history)}
                 if self.up_history is not None else {})
        np.savez_compressed(
            path,
            frame=self.frame,
            accum=np.asarray(self.accum),
            visible=np.asarray(self.visible),
            **{f"dn_{k}": np.asarray(v)
               for k, v in self.dn_state._asdict().items()},
            **extra,
        )

    def load_state(self, path: str) -> None:
        data = np.load(path)
        self.frame = int(data["frame"])
        self.accum = jnp.asarray(data["accum"])
        self.visible = jnp.asarray(data["visible"])
        self.dn_state = denoise.DenoiseState(
            **{k: jnp.asarray(data[f"dn_{k}"])
               for k in denoise.DenoiseState._fields})
        if "up_history" in data:
            self.up_history = jnp.asarray(data["up_history"])
