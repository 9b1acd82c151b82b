"""TLAS8 kernel probe decomposition (256-instance bench config).

Times the two-level wide8 trace pass with xprof DEVICE time under the
HRT_TLAS8_PROBE variants (normal / noenter / noleaf) and reports
per-tile enter/visit/leaf/restore counters (HRT_DEBUG_COUNTERS) — the
instancing-attack measurement harness (VERDICT r4 #2).

One variant per PROCESS (Mosaic flags are read at import):
    python scripts/tlas8_probe.py            # orchestrate all variants
    python scripts/tlas8_probe.py PROBE      # one variant
Results append to /tmp/tlas8_probe.jsonl.
"""
import json
import os
import subprocess
import sys


def run_one(probe: str) -> None:
    os.environ["HRT_TLAS8_PROBE"] = probe
    import jax
    import jax.numpy as jnp
    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    from bench_full import _instance_grid
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import tlas as tlas_mod
    from hrt_tpu.ops import traversal_pallas as tp
    from hrt_tpu.ops import traversal_tlas8 as t8
    from hrt_tpu.ops.v3 import V3
    from hrt_tpu.renderer import camera_arrays
    from hrt_tpu.utils import xprof

    sc = _instance_grid()
    tl = tlas_mod.build_two_level_flat(sc, 32)
    lights = sc.build().lights
    cfg = RenderConfig(width=512, height=384, max_depth=1, sky=True)
    cams = camera_arrays(Camera(position=(0, -1, -6),
                                rotation=(-0.15, 0, 0)), cfg)
    o, d = primary_rays_p(cams.origin, cams.basis, cams.tan_half_fovy,
                          cams.aspect, 512, 384, y0=0, rows=384)
    o, d = o.reshape(-1), d.reshape(-1)

    rec = {"probe": probe or "normal", "rows": tp.TILE_ROWS}

    def call():
        return tlas_mod.closest_hit_tlas(tl, o, d, 1e-3, 1e32)

    t, tri, inst, _, _ = jax.block_until_ready(call())
    rec["hit_frac"] = round(float(np.mean(np.asarray(tri) >= 0)), 3)
    try:
        dev_ms = xprof.device_ms_per_call(lambda: call()[0], calls=8)
    except Exception as e:
        print("xprof failed:", e, file=sys.stderr)
        dev_ms = None
    rec["closest_ms"] = dev_ms and round(dev_ms, 4)

    # Shadow pass from first hits toward the single light.
    hp = V3(o.x + d.x * t, o.y + d.y * t, o.z + d.z * t)
    lx, ly, lz = [float(lights[0][c]) for c in range(3)]
    sd = V3(lx - hp.x, ly - hp.y, lz - hp.z)
    st = jnp.where(tri >= 0, jnp.float32(1.0), -1.0)

    def call_s():
        return tlas_mod.any_hit_tlas(tl, hp, sd, 1e-3, st)

    jax.block_until_ready(call_s())
    try:
        dev_ms = xprof.device_ms_per_call(call_s, calls=8)
    except Exception as e:
        print("xprof failed:", e, file=sys.stderr)
        dev_ms = None
    rec["shadow_ms"] = dev_ms and round(dev_ms, 4)

    if tp.DEBUG_COUNTERS and t8.LAST_COUNTERS is not None:
        jax.block_until_ready(call())
        cnt = np.asarray(t8.LAST_COUNTERS)          # (n_tiles, 4)
        for i, name in enumerate(("enters", "visits", "leaves",
                                  "restores")):
            rec[name + "_tile"] = round(float(cnt[:, i].mean()), 1)
    with open("/tmp/tlas8_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main():
    if len(sys.argv) > 1:
        run_one("" if sys.argv[1] == "normal" else sys.argv[1])
        return
    env = dict(os.environ)
    for probe in ("normal", "noenter", "noleaf"):
        subprocess.run([sys.executable, __file__, probe], env=env,
                       check=False)


if __name__ == "__main__":
    main()
