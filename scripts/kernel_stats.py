"""Measure actual per-tile node/leaf visit counts and derive the
per-visit cost of the packet kernel (run with HRT_DEBUG_COUNTERS=1)."""
import os
import sys
import time

os.environ.setdefault("HRT_DEBUG_COUNTERS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench
    import hrt_tpu.ops.traversal_pallas as tp
    from hrt_tpu.models.camera import Camera, primary_rays
    from hrt_tpu.ops import lbvh

    scene = bench.build_bench_scene().build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=16)
    cam = Camera(position=(0, -1, -6), rotation=(-0.15, 0, 0))
    o, d = primary_rays(*cam.ray_params(512, 384), 512, 384)
    o = jnp.reshape(o, (-1, 3))
    d = jnp.reshape(d, (-1, 3))
    if "--blocked" in sys.argv:
        from hrt_tpu.ops import wavefront
        # square per-group blocks (the wide8 kernel's predication
        # granularity; renderer uses the same mapping)
        g = wavefront.walk_block_geometry(8, tp.TILE_ROWS // 8)
        tob = lambda x: wavefront.to_walk_blocks(x, 384, 512, *g)
        o, d = tob(o), tob(d)
    n = o.shape[0]
    quantum = tp.BLOCK_ROWS * tp.TILE_LANES
    n_pad = ((n + quantum - 1) // quantum) * quantum
    comps = [tp._to_tiles(o[:, 0], n_pad), tp._to_tiles(o[:, 1], n_pad),
             tp._to_tiles(o[:, 2], n_pad), tp._to_tiles(d[:, 0], n_pad),
             tp._to_tiles(d[:, 1], n_pad), tp._to_tiles(d[:, 2], n_pad),
             tp._to_tiles(jnp.full((n,), 1e32, jnp.float32), n_pad,
                          fill=-1.0)]
    nl = accel.tree.child_l.shape[0] + 1
    out = tp._trace_tiles(*comps, accel.flat.nodes, accel.flat.tris,
                          m_real=2 * nl - 1, leaf_size=16, t_min=1e-3,
                          find_closest=True)
    jax.block_until_ready(out)
    # Async dispatch pipelines the calls (amortizing the ~4 ms/call
    # axon tunnel latency); best-of-batches beats the chip's ~2x
    # run-to-run clock variance (CLAUDE.md).
    reps, dt = 30, 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = tp._trace_tiles(*comps, accel.flat.nodes,
                                  accel.flat.tris,
                                  m_real=2 * nl - 1, leaf_size=16,
                                  t_min=1e-3, find_closest=True)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / reps)

    if len(out) < 5:
        print(f"trace time {dt*1e3:.2f} ms for {n} rays "
              f"({n/dt/1e6:.1f} Mray/s closest-only) [counters off]")
        return
    # Counter layout (see traversal_pallas writeback): per walk slice,
    # row 0 = visits, row 1 = 1024*leaves + group-hits.
    arr = np.asarray(out[4])
    visits = arr[0:: tp.TILE_ROWS, 0]
    packed = arr[1:: tp.TILE_ROWS, 0]
    leaves = packed // 1024
    ghits = packed % 1024
    inner = visits - leaves
    n_tiles = len(cnt)
    total_vis = visits.sum()
    total_leaf = leaves.sum()
    print(f"tiles={n_tiles} visits/tile={visits.mean():.1f} "
          f"leaf/tile={leaves.mean():.1f} "
          f"groups-hit/leaf={ghits.sum()/max(leaves.sum(),1):.2f}/8")
    print(f"trace time {dt*1e3:.2f} ms for {n} rays "
          f"({n/dt/1e6:.1f} Mray/s closest-only)")
    # Linear model: dt = inner*c_node + leaf*c_leaf. Assume leaf
    # includes a node-visit's work plus the tri loop:
    cyc = dt * 0.94e9
    print(f"cycles/visit avg: {cyc/total_vis:.0f}  "
          f"(inner={inner.sum()}, leaf={total_leaf})")
    # bound: if leaf cost were 16 tris * ~56 ops * 8 vregs ~ 7200 cyc:
    est_leaf = total_leaf * 7200
    print(f"leaf-share if 7200cyc/leaf: {est_leaf/cyc:.2f}")


if __name__ == "__main__":
    main()
