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


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def render_frame_tiled(scene, accel, cam: CameraArrays, frame: jnp.ndarray,
                       config: RenderConfig, mesh: Mesh) -> jnp.ndarray:
    """Jitted tile-parallel frame: (H, W, 3) assembled from row bands."""
    n = mesh.devices.size
    if config.height % n != 0:
        raise ValueError(
            f"height {config.height} not divisible by {n} devices")
    rows_per = config.height // n

    def tile_fn(scene, accel, cam, frame):
        i = jax.lax.axis_index("tiles")
        y0 = (i * rows_per).astype(jnp.uint32)
        img = render_rows(scene, accel, cam, frame, y0, rows_per, config)
        return img

    fn = jax.shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P("tiles"),
        check_vma=False,
    )
    return fn(scene, accel, cam, frame)


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
