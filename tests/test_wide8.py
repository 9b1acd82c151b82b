"""Sublane-record BVH8 (ops/wide8.py + ops/traversal_wide8.py):
builder structure + kernel exactness vs the float64 oracle.

The kernel runs in interpret mode here (CPU suite); TPU exactness was
cross-checked against the classic packet kernel and the oracle on the
bench scene (round-3 campaign, STATUS.md).  HRT_WIDE8_CPU=1 opts the
routing in (it is off on CPU by default: interpret-mode wide8 walks
are slow)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from hrt_tpu.ops import lbvh, traversal_pallas as tp
from hrt_tpu.ops import wide8
from hrt_tpu.utils import oracle

from test_fuzz import random_scene_data, random_rays


def _wide8_accel(seed, n_tris=220, leaf_size=8):
    data, v0, e1, e2 = random_scene_data(seed, n_tris=n_tris)
    accel = lbvh.build_bvh(data, leaf_size=leaf_size)
    accel = lbvh.attach_wide8(accel)
    return data, accel, v0, e1, e2


def test_build_wide8_structure():
    _, accel, _, _, _ = _wide8_accel(0)
    rec = np.asarray(accel.w8)
    assert rec.ndim == 3 and rec.shape[1:] == (8, 128)
    assert rec.dtype == np.int32
    # Decode all node entries; verify the meta invariants.
    R = rec.shape[0]
    v = (rec.reshape(R, 8, 16, 8).transpose(0, 2, 1, 3)
         .reshape(R * 16, 8, 8))
    meta = v[:, :, 6]
    base = v[:, :, 7][:, 0]
    # Root is node 0 and must have children.
    assert (meta[0] != 0).any()
    # Internal metas encode ranks 0..7; ranks within a node are the
    # 0..k-1 prefix in slot order.
    for n in range(R * 16):
        ranks = [-m - 1 for m in meta[n] if m < 0]
        assert ranks == list(range(len(ranks)))
        if ranks:
            assert 0 <= base[n] < R * 16
    # Leaf metas point inside the padded triangle pool.
    leaf_meta = meta[meta > 0]
    n_tris_pad = 256  # 220 padded to 128-multiple, 8 per leaf
    assert (leaf_meta - 1 < n_tris_pad).all()
    assert ((leaf_meta - 1) % 8 == 0).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_wide8_closest_vs_oracle(seed, monkeypatch):
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    monkeypatch.setattr(tp, "WIDE8", True)
    data, accel, v0, e1, e2 = _wide8_accel(seed)
    assert accel.w8 is not None and tp.use_wide8(accel)
    o, d = random_rays(seed, n=256)
    ot, oi, _, _ = oracle.closest_hit(o, d, v0, e1, e2)
    t, tri = tp.closest_hit(data, accel, jnp.asarray(o), jnp.asarray(d),
                            1e-3, 1e32)[:2]
    tri = np.asarray(tri)
    agree = (tri >= 0) == (oi >= 0)
    assert agree.mean() > 0.99
    both = (tri >= 0) & (oi >= 0)
    np.testing.assert_allclose(np.asarray(t)[both], ot[both],
                               rtol=1e-3, atol=1e-3)


def test_wide8_anyhit_vs_oracle(monkeypatch):
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    monkeypatch.setattr(tp, "WIDE8", True)
    data, accel, v0, e1, e2 = _wide8_accel(2)
    o, d = random_rays(2, n=256)
    tmax = np.full(o.shape[0], 5.0, np.float32)
    occ_o = oracle.any_hit(o, d, v0, e1, e2, t_max=tmax)
    occ = np.asarray(tp.any_hit(data, accel, jnp.asarray(o),
                                jnp.asarray(d), 1e-3,
                                jnp.asarray(tmax)))
    assert (occ == occ_o).mean() > 0.99


def test_wide8_interval_mode_matches(monkeypatch):
    """The conservative interval walk (HRT_W8_EXACT=off) is a superset
    walk: hits must be identical to exact mode."""
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    monkeypatch.setattr(tp, "WIDE8", True)
    data, accel, _, _, _ = _wide8_accel(3)
    o, d = random_rays(3, n=256)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    monkeypatch.setenv("HRT_W8_EXACT", "all")
    t_e, tri_e = tp.closest_hit(data, accel, oj, dj, 1e-3, 1e32)[:2]
    monkeypatch.setenv("HRT_W8_EXACT", "off")
    t_c, tri_c = tp.closest_hit(data, accel, oj, dj, 1e-3, 1e32)[:2]
    np.testing.assert_array_equal(np.asarray(tri_e), np.asarray(tri_c))
    np.testing.assert_allclose(np.asarray(t_e), np.asarray(t_c),
                               rtol=1e-6, atol=1e-6)


def test_wide8_leaf_base_layout():
    """Reorder-built records (the default): leaf children are leaf-
    first in slot order and their tri_starts are exactly
    leaf_base + j*K, with leaf_base<<8 in sublane 1 of lane 7."""
    _, accel, _, _, _ = _wide8_accel(0)
    assert accel.w8_lb
    rec = np.asarray(accel.w8)
    R = rec.shape[0]
    v = (rec.reshape(R, 8, 16, 8).transpose(0, 2, 1, 3)
         .reshape(R * 16, 8, 8))
    meta = v[:, :, 6]
    lb = v[:, 1, 7] // 256
    K = accel.leaf_size
    for n in range(R * 16):
        leaf_slots = [j for j in range(8) if meta[n, j] > 0]
        if not leaf_slots:
            continue
        assert leaf_slots == list(range(len(leaf_slots)))
        for j in leaf_slots:
            assert meta[n, j] - 1 == lb[n] + j * K
    # A node's internal children come after its leaves, empties last.
    for n in range(R * 16):
        cls = [0 if meta[n, j] > 0 else (1 if meta[n, j] < 0 else 2)
               for j in range(8)]
        assert cls == sorted(cls)


def test_wide8_leaf_crossing_schemes_match(monkeypatch):
    """All three leaf-crossing schemes on reorder-built records must
    produce identical hits: per-child (HRT_W8_LB=0 HRT_W8_PACK=0 — the
    round-3 decision-crossing base-corruption regression: sublane 1
    carries leaf_base<<8 and must never leak into base), union-mask
    (HRT_W8_LB=1), and packed (HRT_W8_PACK=1, the production default)."""
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    monkeypatch.setattr(tp, "WIDE8", True)
    data, accel, _, _, _ = _wide8_accel(4)
    assert accel.w8_lb
    o, d = random_rays(4, n=256)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    outs = {}
    for name, lb, pack in (("union", "1", "1"), ("perchild", "0", "0"),
                           ("pack", "0", "1")):
        monkeypatch.setenv("HRT_W8_LB", lb)
        monkeypatch.setenv("HRT_W8_PACK", pack)
        outs[name] = tp.closest_hit(data, accel, oj, dj, 1e-3, 1e32)[:2]
    t0, tri0 = outs["pack"]
    for name in ("union", "perchild"):
        t_, tri_ = outs[name]
        np.testing.assert_array_equal(np.asarray(tri0),
                                      np.asarray(tri_), err_msg=name)
        np.testing.assert_allclose(np.asarray(t0), np.asarray(t_),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("rows", [8, 16, 32])
def test_wide8_rows_param_matches(rows, monkeypatch):
    """The per-call walk-tile `rows` parameter (independent 8/16/32-row
    walks over the same (R, 128) planes — the incoherent-bounce lever,
    scripts/rows_ab.py) must produce hits identical to the default
    64-row walk."""
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    from hrt_tpu.ops.traversal_wide8 import trace_tiles_wide8

    data, accel, _, _, _ = _wide8_accel(5)
    o, d = random_rays(5, n=1024)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    n = oj.shape[0]
    quantum = tp.TILE_ROWS * tp.TILE_LANES
    n_pad = (n + quantum - 1) // quantum * quantum
    tt = lambda x, fill=0.0: tp._to_tiles(x, n_pad, fill)
    comps = [tt(oj[:, 0]), tt(oj[:, 1]), tt(oj[:, 2]),
             tt(dj[:, 0]), tt(dj[:, 1]), tt(dj[:, 2]),
             tt(jnp.full((n,), 1e32, jnp.float32), fill=-1.0)]
    nw = accel.w8.shape[0] * 16
    kw = dict(nw=nw, leaf_size=accel.leaf_size, t_min=1e-3,
              find_closest=True, leaf_base=accel.w8_lb)
    t64, tri64 = trace_tiles_wide8(*comps, accel.w8, accel.flat.tris,
                                   **kw)[:2]
    t_r, tri_r = trace_tiles_wide8(*comps, accel.w8, accel.flat.tris,
                                   rows=rows, **kw)[:2]
    np.testing.assert_array_equal(np.asarray(tri64), np.asarray(tri_r))
    np.testing.assert_allclose(np.asarray(t64), np.asarray(t_r),
                               rtol=1e-6, atol=1e-6)


def test_wide8_skipped_for_huge_trees(monkeypatch):
    """Trees past the id-packing bound must not get a w8 table."""
    monkeypatch.setattr(wide8, "MAX_WIDE_NODES", 4)
    data, accel, _, _, _ = _wide8_accel(0)
    assert accel.w8 is None


@pytest.mark.parametrize("pack", ["0", "1"])
@pytest.mark.parametrize("corrupt", ["base", "leaf", "clean"])
def test_wide8_kernel_guards(corrupt, pack, monkeypatch):
    """HRT_KERNEL_GUARDS=1: a corrupted record table (the round-3
    reorder base-masking fault class — an out-of-range node base or
    leaf tri_start) raises a host-side guard error instead of a TPU
    device fault; clean records pass untouched.  Parametrized over the
    leaf-crossing scheme: the per-child path walks each hit slot's
    meta, while pack mode derives tri_starts from the leaf_base<<8
    word (sublane 1 of lane 7) — each leg corrupts the word its
    kernel actually reads."""
    monkeypatch.setenv("HRT_WIDE8_CPU", "1")
    monkeypatch.setenv("HRT_KERNEL_GUARDS", "1")
    monkeypatch.setenv("HRT_W8_PACK", pack)
    monkeypatch.setattr(tp, "WIDE8", True)
    data, accel, v0, e1, e2 = _wide8_accel(4)
    rec = np.asarray(accel.w8).copy()
    if corrupt == "base":
        # Root node 0: base lane (c=7, sublane 0) -> far out of range.
        rec[0, 0, 7] = 1 << 14
    elif corrupt == "leaf":
        # A LIVE leaf slot -> tri_start beyond the pool.  The reorder
        # build fills leaf-form metas into ABSENT child slots too
        # (their boxes are the +big empty sentinel and are never
        # visited), so pick a slot whose box is real.
        metas = rec[:, :, 6::8]                      # (rows, slot, q)
        bminx = np.ascontiguousarray(rec[:, :, 0::8]).view(np.float32)
        live = (metas > 0) & (bminx < 1e30)
        r_, s_, q_ = [int(a[0]) for a in np.nonzero(live)]
        if pack == "1":
            # Pack mode never reads per-child meta: corrupt the
            # leaf_base<<8 word that node's visits actually decode
            # (lb = word >> 8, so 1 << 24 -> start 65536).
            rec[r_, 1, q_ * 8 + 7] = 1 << 24
        else:
            # 1 << 16 decodes to start 65535 without wrapping the
            # meta<<8 packing.
            rec[r_, s_, q_ * 8 + 6] = 1 << 16
    accel = accel.replace(w8=jnp.asarray(rec))
    o, d = random_rays(4, n=256)
    import jax

    from hrt_tpu.ops import traversal_wide8 as tw

    out = jax.block_until_ready(
        tp.closest_hit(data, accel, jnp.asarray(o),
                       jnp.asarray(d), 1e-3, 1e32))
    if corrupt == "clean":
        tw.check_pending_guards()       # must NOT raise
        tri = out[1]
        ot, oi, _, _ = oracle.closest_hit(o, d, v0, e1, e2)
        assert ((np.asarray(tri) >= 0) == (oi >= 0)).mean() > 0.99
    else:
        with pytest.raises(RuntimeError, match="guard violation"):
            tw.check_pending_guards()
