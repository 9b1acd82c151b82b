"""Wide8 kernel probe at the 1080p BOUNCE-ray distribution.

The path_tracing_1080p config's cost is dominated by the depth-1
closest/shadow passes (~58 of 198 device ms at round-4 start), i.e.
incoherent bounce rays — a very different regime from w8_probe's
coherent camera/shadow bundles.  This script reproduces that
distribution standalone (first hits + cosine bounce directions,
production wavefront sort) and decomposes the kernel cost with the
HRT_W8_PROBE variants + HRT_DEBUG_COUNTERS visit/leaf counters.

One variant per PROCESS (Mosaic flags are read at import):
    python scripts/bounce_probe.py            # orchestrate all
    python scripts/bounce_probe.py PROBE      # one ('' = normal)
Results append to /tmp/bounce_probe.jsonl.
"""
import json
import os
import subprocess
import sys


def run_one(probe: str) -> None:
    os.environ["HRT_W8_PROBE"] = probe
    leaf = int(os.environ.get("HRT_PROBE_LEAF", "32"))
    w, h = 1920, 1080
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import lbvh, rng, sampling, v3
    from hrt_tpu.ops import traversal_pallas as tp, wavefront
    from hrt_tpu.ops.traversal_wide8 import trace_tiles_wide8
    from hrt_tpu.ops.v3 import V3
    from hrt_tpu.renderer import (_hit_attr_table, _shade_attrs_p,
                                  camera_arrays)
    from hrt_tpu.utils import xprof

    scene = bench.build_bench_scene().build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=leaf)
    cfg = RenderConfig(width=w, height=h, max_depth=2, sky=True)
    cams = camera_arrays(Camera(position=(0, -1, -6),
                                rotation=(-0.15, 0, 0)), cfg)
    o, d = primary_rays_p(cams.origin, cams.basis, cams.tan_half_fovy,
                          cams.aspect, w, h, y0=0, rows=h)
    o, d = o.reshape(-1), d.reshape(-1)
    n = o.x.shape[0]
    quantum = tp.TILE_ROWS * tp.TILE_LANES
    n_pad = (n + quantum - 1) // quantum * quantum
    tt = lambda x, fill=0.0: tp._to_tiles(x, n_pad, fill)
    w8, tris = accel.w8, accel.flat.tris
    nw = w8.shape[0] * 16

    # Depth 0: first hits -> interpolated normals -> cosine bounce.
    # The HRT_W8_PROBE variants produce WRONG hits by design, so the
    # bounce-ray setup is cached by the one correct (normal) run and
    # reloaded by the probe variants.
    comps_c = [tt(o.x), tt(o.y), tt(o.z), tt(d.x), tt(d.y), tt(d.z),
               tt(jnp.full((n,), 1e32, jnp.float32), fill=-1.0)]
    # Cache key includes a scene fingerprint (triangle count + a hash
    # of the first tri plane) so scene/camera/kernel changes across
    # rounds can't silently reload stale bounce rays (ADVICE r4).
    import hashlib
    fp = hashlib.sha1(np.asarray(tris[:1]).tobytes()).hexdigest()[:8]
    cache = (f"/tmp/bounce_rays_m6_{leaf}_{tp.TILE_ROWS}"
             f"_{tris.shape[0]}_{fp}.npz")  # m6 = 6-D Morton sort key
    if os.path.exists(cache):
        print(f"[bounce_probe] reusing ray cache {cache} "
              f"(mtime {os.path.getmtime(cache):.0f})")
        z = np.load(cache)
        ox_, oy_, oz_ = [jnp.asarray(z[k]) for k in ("ox", "oy", "oz")]
        dx_, dy_, dz_ = [jnp.asarray(z[k]) for k in ("dx", "dy", "dz")]
        tmax, live = jnp.asarray(z["tmax"]), float(z["live"])
    else:
        assert not probe, "bounce-ray cache must be built by a " \
            "normal-mode run first (probe kernels mis-hit)"
        t, tri, u, v = jax.block_until_ready(trace_tiles_wide8(
            *comps_c, w8, tris, nw=nw, leaf_size=leaf, t_min=1e-3,
            find_closest=True))[:4]
        flat = lambda q: q.reshape(-1)[:n]
        t, tri, u, v = flat(t), flat(tri), flat(u), flat(v)
        tab = _hit_attr_table(accel)
        nrm, mat, rows, uvs = _shade_attrs_p(tab, tri, u, v)
        view = -d
        nrm = v3.where(v3.dot(nrm, view) >= 0.0, nrm, -nrm)
        frame = v3.orthonormal_basis(nrm)
        seed = rng.pixel_seed(jnp.arange(n, dtype=jnp.uint32) % w,
                              jnp.arange(n, dtype=jnp.uint32) // w, 7)
        u1, u2, seed = rng.rand2(seed)
        ld, _ = sampling.cosine_hemisphere_p(u1, u2)
        tangent, bitangent = frame
        bd = tangent * ld.x + bitangent * ld.y + nrm * ld.z
        hitp = o + d * t
        bo = hitp + nrm * 1e-3
        active = tri >= 0

        # Production wavefront sort (same key as renderer.trace_paths).
        DEAD = jnp.uint32(0xFFFFFFFF)
        okey = wavefront.bounce_sort_key_p(bo, bd)
        key = jnp.where(active, okey >> jnp.uint32(1), DEAD)
        key_, ox_, oy_, oz_, dx_, dy_, dz_ = jax.lax.sort(
            [key, bo.x, bo.y, bo.z, bd.x, bd.y, bd.z],
            dimension=0, is_stable=False, num_keys=1)
        tmax = jnp.where(key_ != DEAD, jnp.float32(1e32), -1.0)
        live = float(jnp.mean(active.astype(jnp.float32)))
        np.savez(cache, ox=ox_, oy=oy_, oz=oz_, dx=dx_, dy=dy_,
                 dz=dz_, tmax=tmax, live=live)
    comps_b = [tt(ox_), tt(oy_), tt(oz_), tt(dx_), tt(dy_), tt(dz_),
               tt(tmax, fill=-1.0)]

    rec = {"probe": probe or "normal", "rows": tp.TILE_ROWS,
           "leaf": leaf, "exact": os.environ.get("HRT_W8_EXACT", "all"),
           "live_frac": round(live, 3)}
    for name, comps, fc in (("bounce", comps_b, True),
                            ("primary", comps_c, True)):
        def call():
            return trace_tiles_wide8(*comps, w8, tris, nw=nw,
                                     leaf_size=leaf, t_min=1e-3,
                                     find_closest=fc,
                                     leaf_base=accel.w8_lb)

        jax.block_until_ready(call())
        try:
            dev_ms = xprof.device_ms_per_call(call, calls=4)
        except Exception as e:
            print("xprof failed:", e, file=sys.stderr)
            dev_ms = None
        rec[name + "_ms"] = dev_ms and round(dev_ms, 4)
        if tp.DEBUG_COUNTERS:
            out = call()
            cnt = np.asarray(out[4])
            vis = cnt[0::tp.TILE_ROWS, 0]
            lf = cnt[1::tp.TILE_ROWS, 0] // 1024
            live = vis > 1
            rec[name + "_visits_tile"] = round(float(vis[live].mean()), 1)
            rec[name + "_leaf_tile"] = round(float(lf[live].mean()), 1)
            rec[name + "_live_tiles"] = int(live.sum())
            rec[name + "_tiles"] = int(vis.shape[0])
    with open("/tmp/bounce_probe.jsonl", "a") as f:
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
