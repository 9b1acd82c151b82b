"""Bounded-motion bilinear warp (Pallas kernel).

XLA HBM gathers are latency-bound PER ROW (~20-25 ns regardless of
index locality or row width — ROADMAP measurements), so the SVGF /
temporal-upscaler reprojection warp pays 60-130 ms per packed fetch at
1080p/4K.  This kernel exploits the one thing those gathers cannot:
reprojection motion is locally smooth.  Per output tile,

  1. XLA precomputes each tile's mean integer motion and the residual
     offset RANGE actually used (tiny fused reduces), shipped to the
     kernel as prefetched scalars — zero in-kernel vector->scalar
     crossings;
  2. ONE strided DMA stages the source tile + a +-margin window into
     VMEM (the window base is DMA-aligned: sublane starts rounded down
     to 8, lane starts to 128; the lane slack is normalized away with
     one dynamic roll per channel, the sublane slack by widening the
     statically-unrolled offset span);
  3. the bilinear resolve becomes a short select-over-integer-offsets,
     gated per offset row/column by the prefetched range (scalar
     branches, ~free) — pure VPU work on VMEM-resident data instead of
     millions of HBM row gathers.

Out-of-margin pixels (motion deviating more than `margin` px from the
tile mean — silhouettes under strong parallax) are flagged INVALID;
SVGF and the temporal upscaler already treat invalid history as a
disocclusion and fall back to the current frame / spatial path.

Replaces ops/denoise._bilinear for TPU execution (HRT_PALLAS_WARP=0
falls back; CPU always uses the XLA path — interpret-mode tracing of
the unrolled offset loop is too slow for the test suite, so dedicated
small tests cover the kernel instead).

Reference parity note: the reference has no denoiser/upscaler
implementation (empty stub, Graphics/Denoiser/Denoiser.h:5-12); this
backs the SVGF + temporal-upscale stages that realize the stub's plan.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128
TILE_W = 128
# Residual motion allowed around the tile mean (px).  Larger margins
# survive faster dollies/zooms (the differential across a 128-px tile
# must stay within +-margin) at more VPU work per tile.
MARGIN = int(os.environ.get("HRT_WARP_MARGIN", "8"))

I32 = jnp.int32


def enabled() -> bool:
    """True when the Pallas warp should replace the XLA gather path —
    real TPU only (interpret mode is far slower than the gathers) and
    not explicitly disabled.  Measured at 1080p C=10: 117.7 -> 26.2 ms;
    4K C=3: 252.7 -> 53.6 ms (bit-exact at valid pixels)."""
    return (jax.default_backend() != "cpu"
            and os.environ.get("HRT_PALLAS_WARP", "1") != "0")


def _make_kernel(c: int, hs: int, ws: int, th: int, tw: int, m: int,
                 wh: int, ww: int, off: int):
    span_x = 2 * m + 2        # x offsets are roll-normalized to 0

    def kernel(meta_ref, px_ref, py_ref, src_ref, out_ref, valid_ref,
               win_ref, rol_ref, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        by = meta_ref[0, ti, tj]
        bx = meta_ref[1, ti, tj]
        rymin = meta_ref[2, ti, tj]
        ryhi = meta_ref[3, ti, tj]
        rxmin = meta_ref[4, ti, tj]
        rxhi = meta_ref[5, ti, tj]

        dma = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(pl.multiple_of(by, 8), wh),
                       pl.ds(pl.multiple_of(bx, 128), ww)],
            win_ref, sem)
        dma.start()

        px = px_ref[:, :]
        py = py_ref[:, :]
        # Tap coords, image-edge clamped exactly like the XLA path
        # (ops/denoise._bilinear): x0 <= ws-2 so tap1 stays in-image;
        # px == ws-1 lands all weight on tap1.
        y0 = jnp.clip(jnp.floor(py), 0.0, float(hs - 2))
        x0 = jnp.clip(jnp.floor(px), 0.0, float(ws - 2))
        fy = py - y0
        fx = px - x0
        iy = jax.lax.broadcasted_iota(I32, (th, tw), 0)
        jx = jax.lax.broadcasted_iota(I32, (th, tw), 1)
        # Window-relative tap offsets (source is padded by `off` on
        # top/left so negative motion at the image edge still has a
        # representable window base).
        ry = y0.astype(I32) + off - by - iy
        rxn = x0.astype(I32) + off - bx - jx - rxmin   # roll-normalized
        inb = ((px >= 0.0) & (px <= float(ws - 1))
               & (py >= 0.0) & (py <= float(hs - 1)))
        vmask = (inb & (ry >= rymin) & (ry <= rymin + 2 * m)
                 & (rxn >= 0) & (rxn <= 2 * m)).astype(jnp.float32)
        valid_ref[:, :] = vmask

        out_ref[...] = jnp.zeros((c, th, tw), jnp.float32)
        dma.wait()

        # Normalize the lane slack: one dynamic roll per channel puts
        # the tile's minimum tap column at lane 0.
        shift = (ww - rxmin) % ww
        for ch in range(c):
            rol_ref[ch] = pltpu.roll(win_ref[ch], shift, axis=1)

        fy32 = fy.astype(jnp.float32)
        fx32 = fx.astype(jnp.float32)
        # Loop structure matters more than loop WORK here: a skipped
        # pl.when still costs ~0.3 us of the in-order scalar pipeline,
        # and the original span_y x span_x static grid of gates (594 at
        # margin 8) was 80-90% of the kernel's device time (measured:
        # 24.4 -> 3.7 ms/warp at 1080p C=10 going margin 8 -> 2, with
        # IDENTICAL executed tap counts).  So: static gates only over
        # the x offsets (lane slices must be static), and a DYNAMIC
        # fori_loop over the actual row range — while-loop iterations
        # are ~2-24 ns (ROADMAP round-2 probes) vs 0.3 us per branch,
        # and rows outside [rymin, ryhi+1] never touch the scalar core.
        for ox in range(span_x):
            @pl.when(ox <= rxhi - rxmin + 1)
            def _col(ox=ox):
                wx = jnp.where(rxn == ox, 1.0 - fx32,
                               jnp.where(rxn == ox - 1, fx32, 0.0))

                def row_body(oy, _):
                    wy = jnp.where(ry == oy, 1.0 - fy32,
                                   jnp.where(ry == oy - 1, fy32, 0.0))
                    coeff = wy * wx
                    # Dynamic sublane starts must be 8-aligned: load
                    # the aligned (th+8)-row block and rotate the
                    # residual into place (one sublane roll — window
                    # rows reserve base slack + 8 for this, see wh).
                    base8 = pl.multiple_of((oy // 8) * 8, 8)
                    sh = oy - base8
                    for ch in range(c):
                        blk = rol_ref[ch, pl.ds(base8, th + 8),
                                      ox:ox + tw]
                        blk = pltpu.roll(blk, th + 8 - sh, axis=0)
                        out_ref[ch] += coeff * blk[0:th, :]
                    return 0

                jax.lax.fori_loop(rymin, ryhi + 2, row_body, 0)

        # Invalid pixels (edge-clamped coords can still pick up taps)
        # come back exactly 0.
        for ch in range(c):
            out_ref[ch] *= vmask

    return kernel


def _plan(px, py, hs: int, ws: int, th: int, tw: int, m: int,
          wh: int, ww: int, phs: int, pws: int, off: int):
    """Per-tile window base + residual offset range, as one small fused
    XLA pass.  Returns (6, nty, ntx) i32: by, bx, rymin, ryhi, rxmin,
    rxhi.

    - by/bx: window DMA base in the padded source frame, aligned down
      to the (8, 128) tile grid;
    - rymin/rxmin: loop origin = each tile's minimum in-bounds tap
      offset, clamped to [slack, slack + m] so one outlier pixel cannot
      drag the covered band off the tile's mean motion;
    - ryhi/rxhi: max offset over pixels valid under the kernel's own
      validity formula (loop upper gate).

    Coordinate clamps use the ORIGINAL source extent (hs, ws); window
    bases live in the PADDED frame (top/left offset `off`)."""
    ho, wo = px.shape
    nty, ntx = ho // th, wo // tw
    iy = jnp.arange(ho, dtype=jnp.float32)[:, None]
    jx = jnp.arange(wo, dtype=jnp.float32)[None, :]
    y0 = jnp.clip(jnp.floor(py), 0.0, float(hs - 2))
    x0 = jnp.clip(jnp.floor(px), 0.0, float(ws - 2))
    inb = ((px >= 0.0) & (px <= float(ws - 1))
           & (py >= 0.0) & (py <= float(hs - 1)))
    dy = y0 - iy
    dx = x0 - jx

    tile = lambda a: a.reshape(nty, th, ntx, tw)
    inbt = tile(inb)
    cnt = jnp.maximum(jnp.sum(inbt, axis=(1, 3)), 1)
    big = jnp.int32(1 << 20)

    def axis_plan(d, axis, t0_step, lim, win, align):
        md = jnp.round(jnp.sum(tile(jnp.where(inb, d, 0.0)),
                               axis=(1, 3)) / cnt).astype(I32)
        t0 = jnp.arange(md.shape[axis], dtype=I32) * t0_step
        t0 = t0[:, None] if axis == 0 else t0[None, :]
        ideal = jnp.clip(t0 + md - m + off, 0, lim - win)
        b = (ideal // align) * align
        slack = ideal - b
        # offsets of every pixel relative to this base
        r = (tile(d.astype(I32)) + t0[:, None, :, None] + off
             - b[:, None, :, None])
        rmin = jnp.min(jnp.where(inbt, r, big), axis=(1, 3))
        rmin = jnp.clip(rmin, slack, slack + m)
        return b, rmin, r

    by, rymin, ryt = axis_plan(dy, 0, th, phs, wh, 8)
    bx, rxmin, rxt = axis_plan(dx, 1, tw, pws, ww, 128)

    okt = (inbt
           & (ryt >= rymin[:, None, :, None])
           & (ryt <= (rymin + 2 * m)[:, None, :, None])
           & (rxt >= rxmin[:, None, :, None])
           & (rxt <= (rxmin + 2 * m)[:, None, :, None]))
    ryhi = jnp.max(jnp.where(okt, ryt, -1), axis=(1, 3))
    rxhi = jnp.max(jnp.where(okt, rxt, -1), axis=(1, 3))
    return jnp.stack([by, bx, rymin, ryhi, rxmin, rxhi])


@functools.partial(jax.jit, static_argnames=("margin",))
def warp_bilinear(img, px, py, margin: int = MARGIN):
    """Warp (Hs, Ws, C) `img` to the (Ho, Wo) grid sampling at float
    source coords (px, py).  Returns (val (Ho, Wo, C), valid (Ho, Wo)
    bool).  Valid pixels match ops/denoise._bilinear to 1 ulp (same
    taps/weights; fma association may differ); pixels whose motion
    deviates more than `margin` px from their tile's mean come back
    (0, invalid)."""
    hs, ws, c = img.shape
    ho, wo = px.shape
    m = margin
    th, tw = TILE_H, TILE_W
    # Window extents: y covers base slack (7) + loop origin (<= slack
    # + m) + 2m+1 tap rows + the tile; x covers 128 lanes of base slack
    # + origin (<= slack + m) + 2m+1 + the tile (roll-normalized, so
    # the loop itself only spans 2m+2).
    wh = -(-(th + 3 * m + 9) // 8) * 8
    ww = -(-(tw + 3 * m + 130) // 128) * 128

    # Pad the output grid to tile multiples (pad coords -> invalid) and
    # the source so any in-image window fits.
    pho, pwo = -(-ho // th) * th, -(-wo // tw) * tw
    if (pho, pwo) != (ho, wo):
        fill = -2.0 * max(hs, ws)
        px = jnp.pad(px, ((0, pho - ho), (0, pwo - wo)),
                     constant_values=fill)
        py = jnp.pad(py, ((0, pho - ho), (0, pwo - wo)),
                     constant_values=fill)
    off = m + 1
    # The padded source must fit a whole window at ANY base the plan
    # can ask for (up to ~the source end): reserve one full window
    # beyond the extent, or right/bottom-edge tiles get their ideal
    # base clipped and lose all coverage (their taps fall outside the
    # band the clipped base implies).
    phs = -(-(hs + off) // 8) * 8 + wh
    pws = -(-(ws + off) // 128) * 128 + ww
    src = jnp.moveaxis(img, -1, 0)
    src = jnp.pad(src, ((0, 0), (off, phs - hs - off),
                        (off, pws - ws - off)))

    meta = _plan(px, py, hs, ws, th, tw, m, wh, ww, phs, pws, off)
    nty, ntx = pho // th, pwo // tw

    kernel = _make_kernel(c, hs, ws, th, tw, m, wh, ww, off)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((th, tw), lambda i, j, meta: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j, meta: (i, j),
                         memory_space=pltpu.VMEM),
            # HBM explicitly: ANY lets the compiler pick VMEM for small
            # sources, whose tiled layout rejects unaligned DMA bases.
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((c, th, tw), lambda i, j, meta: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j, meta: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, wh, ww), jnp.float32),
            pltpu.VMEM((c, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    val, valid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c, pho, pwo), jnp.float32),
            jax.ShapeDtypeStruct((pho, pwo), jnp.float32),
        ],
        interpret=(jax.default_backend() == "cpu"),
    )(meta, px, py, src)
    val = jnp.moveaxis(val, 0, -1)[:ho, :wo]
    return val, valid[:ho, :wo] > 0.5
