"""Instanced two-level traversal: wide8 kernel vs binary kernel on TPU.

Validates exactness (same hits as the binary two-level kernel) and
measures the VERDICT round-2 item-3 target (instanced config
7.1 -> >= 30 Mray/s).  Usage: python scripts/bench_tlas.py [--skip-binary]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rays_512x384():
    """Primary rays in the renderer's walk-block order (32x32 pixel
    blocks per 8-row group — the layout the wide kernels' group
    predication is designed for; renderer.py render_rows)."""
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import traversal_pallas as tp
    from hrt_tpu.ops import wavefront
    from hrt_tpu.renderer import camera_arrays

    cfg = RenderConfig(width=512, height=384, max_depth=1, sky=True)
    cams = camera_arrays(Camera(position=(0.0, -6.0, -14.0),
                                rotation=(-0.35, 0.0, 0.0)), cfg)
    o, d = primary_rays_p(cams.origin, cams.basis, cams.tan_half_fovy,
                          cams.aspect, cfg.width, cfg.height,
                          y0=0, rows=cfg.height)
    o, d = o.reshape(-1), d.reshape(-1)
    g = wavefront.walk_block_geometry(8, tp.TILE_ROWS // 8)
    if g is not None:
        tob = lambda x: wavefront.to_walk_blocks(x, cfg.height,
                                                 cfg.width, *g)
        o, d = o.map(tob), d.map(tob)
    return o, d


def run(tl, o, d, mode, batches=4):
    from hrt_tpu.ops import tlas
    from hrt_tpu.utils import xprof

    os.environ["HRT_WIDE8"] = "1" if mode == "wide" else "0"

    def call():
        t, tri, inst, u, v = tlas.closest_hit_tlas(tl, o, d, 1e-3, 1e32)
        occ = tlas.any_hit_tlas(tl, o, d, 1e-3, 40.0)
        return t, tri, inst, u, v, occ

    out = jax.block_until_ready(call())   # compile
    n = o.x.shape[0]
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        jax.block_until_ready(call())
        best = min(best, time.perf_counter() - t0)
    try:
        dev_ms = xprof.device_ms_per_call(call, calls=4)
    except Exception as e:
        print("xprof failed:", e, file=sys.stderr)
        dev_ms = None
    wall_mray = 2 * n / best / 1e6
    dev_mray = None if dev_ms is None else 2 * n / dev_ms / 1e3
    print(f"{mode}: wall {best*1e3:.2f} ms ({wall_mray:.1f} Mray/s), "
          f"device {dev_ms and round(dev_ms, 3)} ms "
          f"({dev_mray and round(dev_mray, 1)} Mray/s) "
          f"[closest+shadow, {n} rays each]")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-binary", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_full import _instance_grid
    from hrt_tpu.ops import tlas

    sc = _instance_grid()
    tl = tlas.build_two_level_flat(sc, leaf_size=16)
    print("w8_nodes:", None if tl.w8_nodes is None else tl.w8_nodes.shape,
          "tlas_nw:", tl.w8_tlas_nw, "tris:", tl.tris.shape)
    o, d = rays_512x384()

    wide = run(tl, o, d, "wide")
    if args.skip_binary or tl.w8_nodes is None:
        return
    binary = run(tl, o, d, "binary")

    t_w, tri_w, inst_w, _, _, occ_w = [np.asarray(x) for x in wide]
    t_b, tri_b, inst_b, _, _, occ_b = [np.asarray(x) for x in binary]
    hit_match = ((tri_w >= 0) == (tri_b >= 0)).mean()
    both = (tri_b >= 0) & (tri_w >= 0)
    t_close = np.isclose(t_w[both], t_b[both], rtol=2e-4, atol=2e-5)
    occ_match = (occ_w == occ_b).mean()
    print(f"hit agree {hit_match:.6f}, t close {t_close.mean():.6f}, "
          f"occ agree {occ_match:.6f}")
    assert hit_match > 0.9999 and t_close.mean() > 0.999 \
        and occ_match > 0.9999


if __name__ == "__main__":
    main()
