"""A/B: light-major vs block-interleaved 2-light shadow batches.

The bench frame's largest op is the light-major shadow trace (1.08 of
2.45 ms device): light 0's fan occupies tiles 0..N-1 and light 1's the
next N, so the two walks visit the (heavily overlapping) upper tree
TWICE and pay two sets of scalar crossings.  Interleaving at half-tile
granularity — each 64-row tile holds a 32-row chunk of hit points
shadowing to light 0 plus the SAME chunk to light 1 — merges the two
walks: shared node visits, one decision crossing, per-group masks
still exact per light.

Usage: python scripts/shadow_ilv_ab.py [reps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import lbvh
    from hrt_tpu.ops import traversal_pallas as tp, wavefront
    from hrt_tpu.ops.traversal_wide8 import trace_tiles_wide8
    from hrt_tpu.renderer import camera_arrays
    from hrt_tpu.utils import xprof

    leaf = 32
    scene = bench.build_bench_scene().build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=leaf)
    w8, tris = accel.w8, accel.flat.tris
    nw = w8.shape[0] * 16
    quantum = tp.TILE_ROWS * tp.TILE_LANES

    def tiles(comps):
        n = comps[0].shape[0]
        n_pad = (n + quantum - 1) // quantum * quantum
        return [tp._to_tiles(c, n_pad, fill=(-1.0 if i == 6 else 0.0))
                for i, c in enumerate(comps)]

    cfg = RenderConfig(width=512, height=384, max_depth=1, sky=True)
    cams = camera_arrays(Camera(position=(0, -1, -6),
                                rotation=(-0.15, 0, 0)), cfg)
    o, d = primary_rays_p(cams.origin, cams.basis, cams.tan_half_fovy,
                          cams.aspect, 512, 384, y0=0, rows=384)
    o, d = o.reshape(-1), d.reshape(-1)
    g = wavefront.walk_block_geometry(8, tp.TILE_ROWS // 8)
    tob = lambda x: wavefront.to_walk_blocks(x, 384, 512, *g)
    o, d = o.map(tob), d.map(tob)
    n = o.x.shape[0]
    comps_c = tiles([o.x, o.y, o.z, d.x, d.y, d.z,
                     jnp.full((n,), 1e32, jnp.float32)])
    t, tri = jax.block_until_ready(trace_tiles_wide8(
        *comps_c, w8, tris, nw=nw, leaf_size=leaf, t_min=1e-3,
        find_closest=True, leaf_base=accel.w8_lb))[:2]
    t, tri = t.reshape(-1)[:n], tri.reshape(-1)[:n]
    hx, hy, hz = (o.x + d.x * t, o.y + d.y * t, o.z + d.z * t)
    live = jnp.where(tri >= 0, 1.0, -1.0)

    L = 2
    lxyz = [[float(scene.lights[i][c]) for c in range(3)]
            for i in range(L)]
    per_light = []
    for i in range(L):
        lx, ly, lz = lxyz[i]
        # Segment to the light: t in [0, 1] via unnormalized direction.
        per_light.append([hx, hy, hz, lx - hx, ly - hy, lz - hz,
                          jnp.where(live > 0, jnp.float32(1.0), -1.0)])

    # A: light-major concatenation (production layout).
    comps_a = tiles([jnp.concatenate([pl[c] for pl in per_light])
                     for c in range(7)])

    # B: block-interleaved — tile t = [32 rows of chunk t to light0;
    # 32 rows of chunk t to light1].
    C = quantum // L
    assert n % C == 0, (n, C)
    nC = n // C

    def ilv(c):
        parts = [pl[c].reshape(nC, 1, C) for pl in per_light]
        return jnp.concatenate(parts, axis=1).reshape(-1)

    comps_b = tiles([ilv(c) for c in range(7)])

    def call(comps):
        return trace_tiles_wide8(*comps, w8, tris, nw=nw,
                                 leaf_size=leaf, t_min=1e-3,
                                 find_closest=False,
                                 leaf_base=accel.w8_lb)

    out_a = jax.block_until_ready(call(comps_a))
    out_b = jax.block_until_ready(call(comps_b))
    occ_a = np.asarray(out_a[1]).reshape(-1)[:L * n] >= 0
    occ_b_i = np.asarray(out_b[1]).reshape(-1)[:L * n] >= 0
    # Un-interleave B for comparison.
    occ_b = occ_b_i.reshape(nC, L, C).transpose(1, 0, 2).reshape(L * n)
    assert (occ_a == occ_b).all(), "occlusion mismatch"
    print("layouts agree", flush=True)

    out_ms = {}
    for rep in range(reps):
        for name, comps in (("lightmajor", comps_a),
                            ("interleave", comps_b)):
            dev_ms = xprof.device_ms_per_call(lambda: call(comps),
                                              calls=8)
            out_ms.setdefault(name, []).append(dev_ms)
            print(json.dumps({"layout": name, "rep": rep,
                              "device_ms": round(dev_ms, 4)}),
                  flush=True)
    print("== best-of-reps ==")
    for name, vals in out_ms.items():
        print(f"{name:11s} {min(vals):8.4f} ms")


if __name__ == "__main__":
    main()
