"""Image textures: a packed texture array + planar bilinear sampling.

The reference plumbs per-vertex UVs end-to-end (Vertex.texCoord,
ref: Scene.h:28-38; shaders interpolate them at objects.slang:50-53)
but ships no image textures — materials are flat colors.  This makes
the UV channel real: textures are packed into ONE (K, R, R, 3) array
(resized host-side to a common resolution), and shading samples the
hit material's base-color texture bilinearly with wrap addressing.

TPU design: a single stacked array means per-ray sampling is four
gathers into one table (no per-texture dispatch); resolution is
uniform so index math is static.  Texture id rides in the material
record's padding slot (models/materials.BASE_COLOR_TEX) — the
pre-sorted hit-attribute table (ops/lbvh.hit_attr_table) then carries
it to shading for free.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TEX_RES = 256


def _resize_host(img: np.ndarray, res: int) -> np.ndarray:
    """Host-side bilinear resize to (res, res, 3) in [0, 1]."""
    # Integer inputs are quantized 8/16-bit images; floats are already
    # linear [0,1] (or HDR — values > 1 stay as-is).  Keying on dtype,
    # not value range: a float texture with values > 1.5 must not be
    # darkened 255x, and a very dark 8-bit image must still be scaled.
    in_dtype = np.asarray(img).dtype
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    img = img[:, :, :3]
    if np.issubdtype(in_dtype, np.integer):
        img = img / np.float32(np.iinfo(in_dtype).max)
    h, w = img.shape[:2]
    if (h, w) == (res, res):
        return img
    ys = np.linspace(0, h - 1, res)
    xs = np.linspace(0, w - 1, res)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = img[y0][:, x0] * (1 - fy) * (1 - fx)
    b = img[y0][:, x1] * (1 - fy) * fx
    c = img[y1][:, x0] * fy * (1 - fx)
    d = img[y1][:, x1] * fy * fx
    return (a + b + c + d).astype(np.float32)


def pack_textures(images: list, res: int = TEX_RES) -> np.ndarray:
    """Stack host images into the (K, res, res, 3) scene texture array."""
    if not images:
        return np.zeros((0, res, res, 3), np.float32)
    return np.stack([_resize_host(im, res) for im in images])


def sample_texture_p(textures: jnp.ndarray, tex_id: jnp.ndarray,
                     u: jnp.ndarray, v: jnp.ndarray):
    """Planar bilinear sample with wrap addressing.

    textures: (K, R, R, 3); tex_id: (N,) i32, < 0 = untextured;
    u/v: (N,) interpolated hit UVs.  Returns an (x, y, z) tuple of
    (N,) planes — 1.0 where untextured (multiplicative identity).
    OBJ convention: v runs bottom-up, images top-down — flipped here.
    """
    k, r = textures.shape[0], textures.shape[1]
    flat = textures.reshape(-1, 3)
    uu = (u - jnp.floor(u)) * r
    vv = (1.0 - (v - jnp.floor(v))) * r  # image rows are top-down
    x0 = jnp.floor(uu)
    y0 = jnp.floor(vv)
    fx = uu - x0
    fy = vv - y0
    x0 = x0.astype(jnp.int32) % r
    y0 = y0.astype(jnp.int32) % r
    x1 = (x0 + 1) % r
    y1 = (y0 + 1) % r
    safe = jnp.clip(tex_id, 0, k - 1) * (r * r)

    def tap(yy, xx):
        return flat[safe + yy * r + xx]             # (N, 3)

    val = (tap(y0, x0) * ((1 - fx) * (1 - fy))[:, None]
           + tap(y0, x1) * (fx * (1 - fy))[:, None]
           + tap(y1, x0) * ((1 - fx) * fy)[:, None]
           + tap(y1, x1) * (fx * fy)[:, None])
    textured = (tex_id >= 0)[:, None]
    val = jnp.where(textured, val, 1.0)
    return val[:, 0], val[:, 1], val[:, 2]


def checkerboard(n: int = 8, res: int = 64,
                 a=(1.0, 1.0, 1.0), b=(0.1, 0.1, 0.1)) -> np.ndarray:
    """Procedural test texture."""
    ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    cell = ((ys * n // res + xs * n // res) % 2).astype(np.float32)
    return (np.asarray(a, np.float32)[None, None] * (1 - cell[..., None])
            + np.asarray(b, np.float32)[None, None] * cell[..., None])
