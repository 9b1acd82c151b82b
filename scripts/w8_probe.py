"""Wide8 kernel probe decomposition (bench scene, closest + shadow).

Times the wide8 traversal per pass with xprof DEVICE time under the
HRT_W8_PROBE variants (normal / noleaf / noextract) and reports
per-tile visit/leaf counters (HRT_DEBUG_COUNTERS) — the round-3
successor of scripts/kernel_stats.py's classic-kernel decomposition.

Each variant recompiles the kernel, so one variant per PROCESS (Mosaic
flags are read at import):
    python scripts/w8_probe.py            # orchestrate all variants
    python scripts/w8_probe.py PROBE      # one variant ('' = normal)
Results append to /tmp/w8_probe.jsonl.
"""
import json
import os
import subprocess
import sys
import time


def run_one(probe: str) -> None:
    os.environ["HRT_W8_PROBE"] = probe
    leaf = int(os.environ.get("HRT_PROBE_LEAF", "32"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import lbvh, traversal_pallas as tp, wavefront
    from hrt_tpu.ops.traversal_wide8 import trace_tiles_wide8
    from hrt_tpu.renderer import camera_arrays
    from hrt_tpu.utils import xprof

    scene = bench.build_bench_scene().build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=leaf)
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
    quantum = tp.TILE_ROWS * tp.TILE_LANES
    n_pad = (n + quantum - 1) // quantum * quantum
    tt = lambda x, fill=0.0: tp._to_tiles(x, n_pad, fill)

    # Closest pass from the camera; shadow pass toward the first light
    # from first-hit points (the production light-major geometry).
    comps_c = [tt(o.x), tt(o.y), tt(o.z), tt(d.x), tt(d.y), tt(d.z),
               tt(jnp.full((n,), 1e32, jnp.float32), fill=-1.0)]
    w8, tris = accel.w8, accel.flat.tris
    nw = w8.shape[0] * 16

    t, tri, _, _ = jax.block_until_ready(trace_tiles_wide8(
        *comps_c, w8, tris, nw=nw, leaf_size=leaf, t_min=1e-3,
        find_closest=True))[:4]
    hitp_x = tt(o.x) + tt(d.x) * t
    hitp_y = tt(o.y) + tt(d.y) * t
    hitp_z = tt(o.z) + tt(d.z) * t
    lx, ly, lz = [float(scene.lights[0][c]) for c in range(3)]
    sdx, sdy, sdz = lx - hitp_x, ly - hitp_y, lz - hitp_z
    st = jnp.where(tri >= 0, jnp.float32(1.0), -1.0)
    comps_s = [hitp_x, hitp_y, hitp_z, sdx, sdy, sdz, st]

    rec = {"probe": probe or "normal", "rows": tp.TILE_ROWS,
           "unroll": tp.LEAF_UNROLL, "leaf": leaf}
    for name, comps, fc in (("closest", comps_c, True),
                            ("shadow", comps_s, False)):
        def call():
            return trace_tiles_wide8(*comps, w8, tris, nw=nw,
                                     leaf_size=leaf, t_min=1e-3,
                                     find_closest=fc,
                                     leaf_base=accel.w8_lb)

        jax.block_until_ready(call())
        try:
            dev_ms = xprof.device_ms_per_call(call, calls=8)
        except Exception as e:
            print("xprof failed:", e, file=sys.stderr)
            dev_ms = None
        rec[name + "_ms"] = dev_ms and round(dev_ms, 4)
        if tp.DEBUG_COUNTERS:
            out = call()
            cnt = np.asarray(out[4])
            vis = cnt[0::tp.TILE_ROWS, 0]
            lf = cnt[1::tp.TILE_ROWS, 0] // 1024
            rec[name + "_visits_tile"] = round(float(vis.mean()), 1)
            rec[name + "_leaf_tile"] = round(float(lf.mean()), 1)
    with open("/tmp/w8_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main():
    if len(sys.argv) > 1:
        run_one("" if sys.argv[1] == "normal" else sys.argv[1])
        return
    env = dict(os.environ)
    for probe in ("normal", "noleaf", "noextract"):
        subprocess.run([sys.executable, __file__, probe], env=env,
                       check=False)


if __name__ == "__main__":
    main()
