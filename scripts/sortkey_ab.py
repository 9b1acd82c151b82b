"""Single-process A/B of bounce-wavefront SORT KEYS.

The bounce trace's wall is the leaf phase (extraction + multi-group
Moller: 27.6 of 35.7 ms — scripts/bounce_probe.py round-5), and leaf
work scales with the union footprint of each (8, 128) ray group.  The
sort key decides that footprint.  Candidates (all data-only: the
kernel binary is identical, so every variant reuses one compile):

  omaj   morton10(origin)<<2 | octant>>1          (production)
  dmaj   octant<<30 | morton10(origin)            direction-major
  m6d    6-D Morton: interleave 8 origin bits/axis with 2-3
         direction bits/axis (joint position+direction locality)
  m6f    as m6d with 5 direction bits/axis (direction-finer)

Also sweeps HRT_PROBE_LEAF if set (separate accel builds).

Usage: python scripts/sortkey_ab.py [reps]
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
    from hrt_tpu.ops import lbvh, rng, sampling, v3
    from hrt_tpu.ops import traversal_pallas as tp, wavefront
    from hrt_tpu.ops.traversal_wide8 import trace_tiles_wide8
    from hrt_tpu.renderer import (_hit_attr_table, _shade_attrs_p,
                                  camera_arrays)
    from hrt_tpu.utils import xprof

    leaf = int(os.environ.get("HRT_PROBE_LEAF", "32"))
    scene = bench.build_bench_scene().build()
    accel = lbvh.build_bvh_sah(scene, leaf_size=leaf)
    w8, tris = accel.w8, accel.flat.tris
    nw = w8.shape[0] * 16
    quantum = tp.TILE_ROWS * tp.TILE_LANES

    w_, h_ = 1920, 1080
    cfg2 = RenderConfig(width=w_, height=h_, max_depth=2, sky=True)
    cams2 = camera_arrays(Camera(position=(0, -1, -6),
                                 rotation=(-0.15, 0, 0)), cfg2)
    o2, d2 = primary_rays_p(cams2.origin, cams2.basis,
                            cams2.tan_half_fovy, cams2.aspect,
                            w_, h_, y0=0, rows=h_)
    o2, d2 = o2.reshape(-1), d2.reshape(-1)
    n2 = o2.x.shape[0]
    n_pad = (n2 + quantum - 1) // quantum * quantum
    tt = lambda x, fill=0.0: tp._to_tiles(x, n_pad, fill)
    tiles = lambda o, d, tm: [tt(o.x), tt(o.y), tt(o.z),
                              tt(d.x), tt(d.y), tt(d.z),
                              tt(tm, fill=-1.0)]
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

    # ---- key builders ----------------------------------------------
    def norm01(c, lo, hi):
        return jnp.clip((c - lo) / jnp.maximum(hi - lo, 1e-9), 0.0,
                        1.0 - 1e-7)

    lo = [jnp.min(bo.x), jnp.min(bo.y), jnp.min(bo.z)]
    hi = [jnp.max(bo.x), jnp.max(bo.y), jnp.max(bo.z)]
    px = norm01(bo.x, lo[0], hi[0])
    py = norm01(bo.y, lo[1], hi[1])
    pz = norm01(bo.z, lo[2], hi[2])

    def spread(v, bits, total):
        """Interleave `bits` bits of v (uint) at stride `total` bits."""
        out = jnp.zeros_like(v)
        for i in range(bits):
            out = out | (((v >> jnp.uint32(i)) & 1)
                         << jnp.uint32(i * total))
        return out

    def key_m6(pos_bits, dir_bits):
        """Joint 6-D Morton: per axis, pos_bits position bits and
        dir_bits direction bits, all interleaved (pos bits above dir
        bits within each level so position dominates at equal scale)."""
        total = 6
        q = lambda c, b: jnp.minimum(
            (c * (1 << b)).astype(jnp.uint32), (1 << b) - 1)
        dxn = norm01(bd.x, -1.0, 1.0)
        dyn = norm01(bd.y, -1.0, 1.0)
        dzn = norm01(bd.z, -1.0, 1.0)
        k = jnp.zeros(bo.x.shape, jnp.uint32)
        chans = [(q(px, pos_bits), pos_bits), (q(py, pos_bits), pos_bits),
                 (q(pz, pos_bits), pos_bits), (q(dxn, dir_bits), dir_bits),
                 (q(dyn, dir_bits), dir_bits), (q(dzn, dir_bits), dir_bits)]
        # Bit-plane interleave, MSB-first across all six channels.
        maxb = max(pos_bits, dir_bits)
        shift = jnp.uint32(0)
        out = jnp.zeros(bo.x.shape, jnp.uint32)
        for level in range(maxb - 1, -1, -1):
            for v, b in chans:
                if level < b:
                    out = (out << jnp.uint32(1)) | ((v >> jnp.uint32(level)) & 1)
        return out

    def key_omaj():
        return wavefront.bounce_sort_key_p(bo, bd)

    def key_dmaj():
        from hrt_tpu.ops import morton
        q = lambda c: jnp.minimum((c * 1024).astype(jnp.uint32), 1023)
        code = morton.morton3d(q(px), q(py), q(pz))
        octant = ((bd.x > 0).astype(jnp.uint32)
                  | ((bd.y > 0).astype(jnp.uint32) << 1)
                  | ((bd.z > 0).astype(jnp.uint32) << 2))
        return (octant << jnp.uint32(29)) | (code >> jnp.uint32(1))

    keys = {
        "omaj": key_omaj,
        "dmaj": key_dmaj,
        "m6d_p8d2": lambda: key_m6(8, 2),
        "m6d_p8d4": lambda: key_m6(8, 4),
        "m6d_p6d4": lambda: key_m6(6, 4),
        "m6d_p5d5": lambda: key_m6(5, 5),
    }

    DEAD = jnp.uint32(0xFFFFFFFF)
    sorted_comps = {}
    for name, kf in keys.items():
        okey = kf()
        key = jnp.where(active, okey >> jnp.uint32(1), DEAD)
        key_, ox_, oy_, oz_, dx_, dy_, dz_ = jax.lax.sort(
            [key, bo.x, bo.y, bo.z, bd.x, bd.y, bd.z],
            dimension=0, is_stable=False, num_keys=1)
        tmax_b = jnp.where(key_ != DEAD, jnp.float32(1e32), -1.0)
        sorted_comps[name] = tiles(v3.V3(ox_, oy_, oz_),
                                   v3.V3(dx_, dy_, dz_), tmax_b)

    def call(comps):
        return trace_tiles_wide8(*comps, w8, tris, nw=nw,
                                 leaf_size=leaf, t_min=1e-3,
                                 find_closest=True,
                                 leaf_base=accel.w8_lb)

    counters = tp.DEBUG_COUNTERS
    for name, comps in sorted_comps.items():
        out = jax.block_until_ready(call(comps))
        if counters:
            cnt = np.asarray(out[4])
            vis = cnt[0::tp.TILE_ROWS, 0]
            lf = cnt[1::tp.TILE_ROWS, 0] // 1024
            live = vis > 1
            print(json.dumps({"key": name, "visits": round(
                float(vis[live].mean()), 1), "leafs": round(
                float(lf[live].mean()), 1),
                "live_tiles": int(live.sum())}), flush=True)
    out_ms = {}
    for rep in range(reps):
        for name, comps in sorted_comps.items():
            dev_ms = xprof.device_ms_per_call(lambda: call(comps),
                                              calls=6)
            out_ms.setdefault(name, []).append(dev_ms)
            print(json.dumps({"key": name, "rep": rep, "leaf": leaf,
                              "device_ms": round(dev_ms, 4)}),
                  flush=True)
    print("== best-of-reps ==")
    for name, vals in out_ms.items():
        print(f"{name:10s} {min(vals):8.4f} ms")


if __name__ == "__main__":
    main()
