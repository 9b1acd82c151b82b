"""Multi-chip rendering: image-tile data parallelism over a device mesh.

The reference's only parallelism is per-pixel SIMT inside one
vkCmdTraceRaysKHR dispatch (ref: RTPipeline.cpp:41-43).  The TPU
counterpart is row-band sharding over chips with `shard_map`: each chip
traces a horizontal band of the frame, the scene (triangle pool, BVH,
tables) is replicated, and the only collective is the implicit
all-gather of the output shards over ICI.  Whole-image statistics
(exposure / variance for the denoiser) use `psum` inside the same
program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..renderer import CameraArrays, render_rows


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1D 'tiles' mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("tiles",))


@functools.partial(jax.jit,
                   static_argnames=("config", "mesh", "want_gbuffer"))
def render_frame_tiled(scene, accel, cam: CameraArrays, frame: jnp.ndarray,
                       config: RenderConfig, mesh: Mesh,
                       want_gbuffer: bool = False):
    """Jitted tile-parallel frame: (H, W, 3) assembled from row bands
    (+ a row-sharded G-buffer dict when want_gbuffer)."""
    n = mesh.devices.size
    if config.height % n != 0:
        raise ValueError(
            f"height {config.height} not divisible by {n} devices")
    rows_per = config.height // n

    def tile_fn(scene, accel, cam, frame):
        i = jax.lax.axis_index("tiles")
        y0 = (i * rows_per).astype(jnp.uint32)
        return render_rows(scene, accel, cam, frame, y0, rows_per,
                           config, want_gbuffer=want_gbuffer)

    fn = jax.shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P("tiles"),   # pytree prefix: every output row-sharded
        check_vma=False,
    )
    return fn(scene, accel, cam, frame)


@functools.partial(jax.jit, static_argnames=("config", "net", "mesh"))
def frame_program_tiled(scene, accel, cams: CameraArrays,
                        prev_cams: CameraArrays, dn_state, accum, frame,
                        config: RenderConfig, mesh: Mesh, net=None,
                        up_params=None, up_history=None):
    """The FULL frame pipeline (trace -> shade -> accumulate -> denoise
    -> upscale) as one multi-chip program.

    trace+shade runs under shard_map (the Pallas kernels need explicit
    per-device calls); the quality stages then run on the row-sharded
    global arrays under ordinary jit — XLA's sharding propagation
    partitions the SVGF stencils, reprojection gathers, and upscaler
    convs, inserting halo/all-gather collectives where rows interact.
    This is the multi-chip form of the reference's single
    vkCmdTraceRaysKHR dispatch + post passes (RTPipeline.cpp:41-43),
    scaled over ICI instead of one GPU's SMs."""
    from ..frameloop import _post_stages, _wants_gbuffer

    want_gb = _wants_gbuffer(config, up_history)
    out = render_frame_tiled(scene, accel, cams, frame, config, mesh,
                             want_gbuffer=want_gb)
    img, gbuffer = out if want_gb else (out, None)
    # pallas_warp=False: the post stages run on row-sharded globals
    # under GSPMD, where a pallas_call cannot be partitioned — the XLA
    # gather warp shards fine (its halo is a compiler-inserted
    # collective).
    return _post_stages(img, gbuffer, prev_cams, dn_state, accum,
                        frame, config, net, up_params, up_history,
                        pallas_warp=False)


def frame_stats_psum(img_shard: jnp.ndarray, axis_name: str = "tiles"):
    """Whole-image mean/max luminance via psum inside a shard_map region
    (auto-exposure + denoiser statistics)."""
    from ..ops.math3d import luminance

    lum = luminance(img_shard)
    total = jax.lax.psum(jnp.sum(lum), axis_name)
    count = jax.lax.psum(jnp.float32(lum.size), axis_name)
    peak = jax.lax.pmax(jnp.max(lum), axis_name)
    return total / count, peak


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh (scene/BVH arrays —
    the analogue of BLAS replication via all_gather)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
