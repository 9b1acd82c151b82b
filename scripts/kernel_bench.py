"""A/B harness for packet-kernel variants: times _trace_tiles alone,
closest + shadow loads, with dispatch overhead amortized by scanning
the kernel k times inside one jit.

Usage: python scripts/kernel_bench.py [--reps 32]
Env:   HRT_* tunables apply (TILE_ROWS, LEAF_UNROLL, SPEC, ...).
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    import bench
    import hrt_tpu.ops.traversal_pallas as tp
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import lbvh
    from hrt_tpu.renderer import camera_arrays

    cfg = RenderConfig(width=512, height=384)
    scene = bench.build_bench_scene().build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=16)
    cams = camera_arrays(Camera(position=(0, -1, -6),
                                rotation=(-0.15, 0, 0)), cfg)
    o, d = primary_rays_p(cams.origin, cams.basis, cams.tan_half_fovy,
                          cams.aspect, 512, 384)
    o = o.reshape(-1)
    d = d.reshape(-1)
    n = o.x.shape[0]
    nl = accel.tree.child_l.shape[0] + 1
    m_real = 2 * nl - 1

    # Closest pass on primary rays; shadow-like pass re-traces from the
    # hit points toward the bench scene's first light (light-major
    # batching is what the frame does).
    t, tri, u, v = tp.closest_hit_p(scene, accel, o, d, 1e-3, 1e32,
                                    sorted_ids=True)
    hit = tri >= 0
    wp = o + d * t
    lx, ly, lz = 0.0, -4.0, -2.0
    from hrt_tpu.ops import v3
    from hrt_tpu.ops.v3 import V3

    ldir = V3(lx - wp.x, ly - wp.y, lz - wp.z)
    sd = v3.normalize(ldir)
    st = jnp.where(hit, v3.length(ldir), -1.0)

    @functools.partial(jax.jit, static_argnames=("find_closest", "reps"))
    def k_times(ox, oy, oz, dx, dy, dz, tmax, nodes, tris,
                find_closest: bool, reps: int):
        def step(carry, _):
            out = tp._trace_tiles(ox, oy, oz, dx, dy, dz,
                                  tmax + carry * 0.0, nodes, tris,
                                  m_real=m_real, leaf_size=16,
                                  t_min=1e-3,
                                  find_closest=find_closest)
            return carry + out[0][0, 0] * 0.0, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
        return c

    quantum = tp.BLOCK_ROWS * tp.TILE_LANES
    n_pad = ((n + quantum - 1) // quantum) * quantum
    tt = lambda x, fill=0.0: tp._to_tiles(x, n_pad, fill)

    nodes = accel.flat.nodes
    print("node table:", nodes.shape)

    for name, (ox, oy, oz) , (dx, dy, dz), tmax in (
        ("closest", (o.x, o.y, o.z), (d.x, d.y, d.z),
         jnp.full((n,), 1e32, jnp.float32)),
        ("shadow ", (wp.x, wp.y, wp.z), (sd.x, sd.y, sd.z), st),
    ):
        comps = [tt(ox), tt(oy), tt(oz), tt(dx), tt(dy), tt(dz),
                 tt(tmax, fill=-1.0)]
        fc = name == "closest"
        r = k_times(*comps, nodes, accel.flat.tris,
                    find_closest=fc, reps=args.reps)
        jax.block_until_ready(r)
        best = 9e9
        for _ in range(args.batches):
            t0 = time.perf_counter()
            r = k_times(*comps, nodes, accel.flat.tris,
                        find_closest=fc, reps=args.reps)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / args.reps)
        print(f"{name}: {best*1e3:.3f} ms/pass  "
              f"{n/best/1e6:.0f} Mray/s")


if __name__ == "__main__":
    main()
