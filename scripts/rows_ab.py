"""Single-process A/B: wide8 walk-tile ROWS x node-test mode.

The wide8 kernel's per-visit vector cost scales with rows/tile (exact
mode: rows x 8-children slab tests), while its per-visit SCALAR
crossing cost is rows-independent.  For INCOHERENT tiles (1080p
sorted-bounce wavefront) the 64-ray union walk saturates the tree, so
splitting a tile into independent 8/16/32-row walks should cut vector
node work roughly in proportion while total crossings stay flat; for
COHERENT tiles (camera blocks, shadow fans) the sub-walks overlap and
smaller tiles multiply crossings.  This script measures the tradeoff
directly: rows in {64, 32, 16, 8} x HRT_W8_EXACT in {all, off} over
the three production regimes (closest camera blocks / light-major
shadow fan / 1080p sorted bounce).  `rows` is a per-call kernel
parameter (no relayout: tiles are (R, 128) planes either way), and
HRT_W8_EXACT is read per call, so everything interleaves in ONE
process (stable clocks, no tunnel-wedge risk).

Usage: python scripts/rows_ab.py [reps]      (default 2)
Appends JSON lines to /tmp/rows_ab.jsonl.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import jax
    import jax.numpy as jnp

    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera, primary_rays_p
    from hrt_tpu.ops import rng, sampling, v3
    from hrt_tpu.ops import traversal_pallas as tp, wavefront
    from hrt_tpu.ops.traversal_wide8 import trace_tiles_wide8
    from hrt_tpu.renderer import (_hit_attr_table, _shade_attrs_p,
                                  camera_arrays)
    from hrt_tpu.utils import xprof

    leaf = 32
    scene = bench.build_bench_scene().build()
    from hrt_tpu.ops import lbvh

    accel = lbvh.build_bvh_sah(scene, leaf_size=leaf)
    w8, tris = accel.w8, accel.flat.tris
    nw = w8.shape[0] * 16
    quantum = tp.TILE_ROWS * tp.TILE_LANES

    def tiles(o, d, tmax):
        n = o.x.shape[0]
        n_pad = (n + quantum - 1) // quantum * quantum
        tt = lambda x, fill=0.0: tp._to_tiles(x, n_pad, fill)
        return [tt(o.x), tt(o.y), tt(o.z), tt(d.x), tt(d.y), tt(d.z),
                tt(tmax, fill=-1.0)]

    # --- closest: bench-camera walk blocks ---------------------------
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
    comps_c = tiles(o, d, jnp.full((n,), 1e32, jnp.float32))

    # --- shadow: first hits toward light 0 ---------------------------
    t, tri, _, _ = jax.block_until_ready(trace_tiles_wide8(
        *comps_c, w8, tris, nw=nw, leaf_size=leaf, t_min=1e-3,
        find_closest=True, leaf_base=accel.w8_lb))[:4]
    hx = comps_c[0] + comps_c[3] * t
    hy = comps_c[1] + comps_c[4] * t
    hz = comps_c[2] + comps_c[5] * t
    lx, ly, lz = [float(scene.lights[0][c]) for c in range(3)]
    st = jnp.where(tri >= 0, jnp.float32(1.0), -1.0)
    comps_s = [hx, hy, hz, lx - hx, ly - hy, lz - hz, st]

    # --- bounce: 1080p sorted cosine-bounce wavefront ---------------
    w_, h_ = 1920, 1080
    cfg2 = RenderConfig(width=w_, height=h_, max_depth=2, sky=True)
    cams2 = camera_arrays(Camera(position=(0, -1, -6),
                                 rotation=(-0.15, 0, 0)), cfg2)
    o2, d2 = primary_rays_p(cams2.origin, cams2.basis,
                            cams2.tan_half_fovy, cams2.aspect,
                            w_, h_, y0=0, rows=h_)
    o2, d2 = o2.reshape(-1), d2.reshape(-1)
    n2 = o2.x.shape[0]
    comps_p = tiles(o2, d2, jnp.full((n2,), 1e32, jnp.float32))
    t2, tri2, u2, v2 = jax.block_until_ready(trace_tiles_wide8(
        *comps_p, w8, tris, nw=nw, leaf_size=leaf, t_min=1e-3,
        find_closest=True, leaf_base=accel.w8_lb))[:4]
    flat = lambda q: q.reshape(-1)[:n2]
    t2, tri2, u2, v2 = flat(t2), flat(tri2), flat(u2), flat(v2)
    tab = _hit_attr_table(accel)
    nrm, _, _, _ = _shade_attrs_p(tab, tri2, u2, v2)
    view = -d2
    nrm = v3.where(v3.dot(nrm, view) >= 0.0, nrm, -nrm)
    tangent, bitangent = v3.orthonormal_basis(nrm)
    seed = rng.pixel_seed(jnp.arange(n2, dtype=jnp.uint32) % w_,
                          jnp.arange(n2, dtype=jnp.uint32) // w_, 7)
    u1, uu2, seed = rng.rand2(seed)
    ld, _ = sampling.cosine_hemisphere_p(u1, uu2)
    bd = tangent * ld.x + bitangent * ld.y + nrm * ld.z
    bo = o2 + d2 * t2 + nrm * 1e-3
    active = tri2 >= 0
    DEAD = jnp.uint32(0xFFFFFFFF)
    okey = wavefront.bounce_sort_key_p(bo, bd)
    key = jnp.where(active, okey >> jnp.uint32(1), DEAD)
    key_, ox_, oy_, oz_, dx_, dy_, dz_ = jax.lax.sort(
        [key, bo.x, bo.y, bo.z, bd.x, bd.y, bd.z],
        dimension=0, is_stable=False, num_keys=1)
    tmax_b = jnp.where(key_ != DEAD, jnp.float32(1e32), -1.0)
    comps_b = tiles(v3.V3(ox_, oy_, oz_), v3.V3(dx_, dy_, dz_), tmax_b)

    passes = (("bounce", comps_b, True), ("closest", comps_c, True),
              ("shadow", comps_s, False))
    variants = [("exact", r) for r in (64, 32, 16, 8)]
    variants += [("interval", r) for r in (64, 32, 16, 8)]

    import numpy as np

    ref = {}

    def call(comps, fc, mode, rows):
        os.environ["HRT_W8_EXACT"] = ("all" if mode == "exact"
                                      else "off")
        return trace_tiles_wide8(
            *comps, w8, tris, nw=nw, leaf_size=leaf, t_min=1e-3,
            find_closest=fc, leaf_base=accel.w8_lb, rows=rows)

    # Warm all compiles + correctness cross-check.
    for pname, comps, fc in passes:
        for mode, rows in variants:
            out = jax.block_until_ready(call(comps, fc, mode, rows))
            tri_np = np.asarray(out[1])
            if pname not in ref:
                ref[pname] = tri_np
            else:
                if pname == "shadow":
                    same = (tri_np >= 0) == (ref[pname] >= 0)
                else:
                    same = tri_np == ref[pname]
                assert same.all(), (pname, mode, rows)
    print("warmup + cross-check done", flush=True)

    out_ms = {}
    for rep in range(reps):
        for mode, rows in variants:
            for pname, comps, fc in passes:
                dev_ms = xprof.device_ms_per_call(
                    lambda: call(comps, fc, mode, rows), calls=6)
                out_ms.setdefault((mode, rows, pname), []).append(dev_ms)
                rec = {"mode": mode, "rows": rows, "pass": pname,
                       "rep": rep, "device_ms": round(dev_ms, 4)}
                with open("/tmp/rows_ab.jsonl", "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
    print("== best-of-reps ==")
    for (mode, rows, pname), vals in sorted(out_ms.items()):
        print(f"{mode:9s} rows={rows:2d} {pname:8s} {min(vals):8.4f} ms")


if __name__ == "__main__":
    main()
