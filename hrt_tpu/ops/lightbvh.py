"""Light BVH: hierarchical many-light importance sampling.

The reference declares `LightBVHNode` and never uses it
(ref: Graphics/RayTracing/Scene.h:123-130); its shading loops over all
lights per pixel (ref: calculateColor, shaders/raytracing.slang:77-85).
This is the real thing, designed TPU-first:

- an IMPLICIT COMPLETE binary tree over morton-sorted lights (padded to
  a power of two with zero-energy dummies) instead of a pointer-linked
  Karras tree: the descent has a STATIC depth of exactly log2(Lp)
  levels, each level is one array, and per-ray node state is a plain
  integer plane — no data-dependent control flow, no stack;
- stochastic descent: at each level a ray picks a child with
  probability proportional to cluster importance (energy over squared
  distance to the cluster AABB), re-using one uniform sample by
  rescaling (Shirley's trick).  The product of branch probabilities IS
  the pdf, so the estimator f * vis / pdf is unbiased.

Per (ray, bounce, sample) cost: log2(L) gathers of small per-level
tables — O(log L) instead of the O(L) weight scan of the flat CDF
sampler (renderer._direct_sampled_p), which this replaces for large
light counts.

Directional lights carry no meaningful position, so their energy rides
a SEPARATE distance-independent channel: each cluster stores
(energy_pos, energy_dir), and cluster importance is
energy_pos / d(p, box)^2 + energy_dir — matching the shading-time
semantics (process_light_rows applies a directional's intensity with
no falloff, a point/spot's with 1/d^2).  The descent probabilities and
the returned pdf always come from the same weights, so the estimator
stays unbiased for any mix.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import morton, v3
from .v3 import V3

I32 = jnp.int32


class LightTree(NamedTuple):
    """Per-level cluster arrays, root (level 0, size 1) to leaves
    (level D, size Lp = 2^D).  Node i at level k has children 2i and
    2i+1 at level k+1."""

    bmin: tuple           # level k: (2^k, 3)
    bmax: tuple
    energy: tuple         # level k: (2^k,) positional (point/spot)
    energy_dir: tuple     # level k: (2^k,) directional (no falloff)
    perm: jnp.ndarray     # (Lp,) leaf -> original light row (dummies
    #                       point at light 0 but carry zero energy)
    # Descent tables: pair[k] is (2^k, 16) = both children of node i
    # at level k packed in one row [bminL, bmaxL, eL, edL, bminR,
    # bmaxR, eR, edR].  TPU gathers are ROW-COUNT-bound (~1.5 ns/row
    # whatever the width — round-5 measurement), so the descent pays
    # ONE wide gather per level instead of the 16 narrow (N, 3)
    # gathers + column slices of the naive form (which made the
    # 256-light descent 3x SLOWER than the O(L) flat-CDF scan).
    pair: tuple = ()

    @property
    def depth(self) -> int:
        return len(self.energy) - 1


def _luminance(c):
    return 0.2126 * c[:, 0] + 0.7152 * c[:, 1] + 0.0722 * c[:, 2]


def build_light_tree(lights: jnp.ndarray) -> LightTree:
    """lights: (L, LIGHT_W) — see models/lights.py layout."""
    l = lights.shape[0]
    if l == 0:
        raise ValueError("no lights")
    lp = 1
    while lp < l:
        lp *= 2
    from ..models.lights import DIRECTIONAL, TYPE

    pos = lights[:, 0:3]
    energy = lights[:, 6] * (_luminance(lights[:, 3:6]) + 1e-6)
    # Directional lights (with a real direction) shade with NO distance
    # falloff (process_light_rows), so their energy goes to the
    # distance-independent channel.
    ldir = lights[:, 8:11]
    is_dir = (lights[:, TYPE] == DIRECTIONAL) & (
        jnp.sum(ldir * ldir, axis=1) > 1e-12)
    e_pos = jnp.where(is_dir, 0.0, energy)
    e_dir = jnp.where(is_dir, energy, 0.0)

    codes = morton.morton_codes(pos, jnp.min(pos, 0), jnp.max(pos, 0))
    order = jnp.argsort(codes).astype(I32)
    # Pad with zero-energy dummies at the last real light's position
    # (keeps parent boxes tight; zero energy = never sampled).
    perm = jnp.concatenate(
        [order, jnp.broadcast_to(order[-1], (lp - l,))])
    leaf_pos = pos[perm]
    pad0 = jnp.zeros((lp - l,), jnp.float32)
    leaf_e = jnp.concatenate([e_pos[order], pad0])
    leaf_ed = jnp.concatenate([e_dir[order], pad0])

    bmin, bmax, e, ed = [leaf_pos], [leaf_pos], [leaf_e], [leaf_ed]
    while bmin[0].shape[0] > 1:
        bmin.insert(0, jnp.minimum(bmin[0][0::2], bmin[0][1::2]))
        bmax.insert(0, jnp.maximum(bmax[0][0::2], bmax[0][1::2]))
        e.insert(0, e[0][0::2] + e[0][1::2])
        ed.insert(0, ed[0][0::2] + ed[0][1::2])
    pair = []
    for k in range(len(e) - 1):
        half = lambda s: jnp.concatenate(
            [bmin[k + 1][s::2], bmax[k + 1][s::2],
             e[k + 1][s::2, None], ed[k + 1][s::2, None]], axis=1)
        pair.append(jnp.concatenate([half(0), half(1)], axis=1))
    return LightTree(bmin=tuple(bmin), bmax=tuple(bmax), energy=tuple(e),
                     energy_dir=tuple(ed), perm=perm, pair=tuple(pair))


def _importance(bmin, bmax, energy, energy_dir, idx, p: V3):
    """Cluster importance for each ray:
    energy / max(d(p, box)^2, eps) + energy_dir (directional channel,
    no falloff).  Gathers one level's arrays at per-ray indices."""
    bn = bmin[idx]
    bx = bmax[idx]
    cx = jnp.clip(p.x, bn[:, 0], bx[:, 0]) - p.x
    cy = jnp.clip(p.y, bn[:, 1], bx[:, 1]) - p.y
    cz = jnp.clip(p.z, bn[:, 2], bx[:, 2]) - p.z
    d2 = cx * cx + cy * cy + cz * cz
    return energy[idx] / jnp.maximum(d2, 1e-2) + energy_dir[idx]


def _importance_t(rt, base: int, p: V3):
    """Cluster importance from transposed paired-row planes (rt is an
    indexable of (N,) planes; base 0 = left child, 8 = right)."""
    cx = jnp.clip(p.x, rt[base + 0], rt[base + 3]) - p.x
    cy = jnp.clip(p.y, rt[base + 1], rt[base + 4]) - p.y
    cz = jnp.clip(p.z, rt[base + 2], rt[base + 5]) - p.z
    d2 = cx * cx + cy * cy + cz * cz
    return rt[base + 6] / jnp.maximum(d2, 1e-2) + rt[base + 7]


def sample_light(tree: LightTree, p: V3, u: jnp.ndarray):
    """Stochastic descent: one light per ray.

    p: V3 of (N,) shading positions; u: (N,) uniforms.
    Returns (light_id (N,) i32 into the ORIGINAL light table,
    pdf (N,) f32 — the exact discrete probability of that pick).

    Each level costs ONE (N, 16) gather of the paired-children table
    (see LightTree.pair) + elementwise math: measured 75.2 -> 13.2 ms
    device on the 256-light bench config (scripts/lights_ab.py) vs
    the naive per-child (N, 3) gathers, whose row-count-bound cost
    made the tree lose 3x to the flat-CDF scan."""
    n = u.shape[0]
    idx = jnp.zeros((n,), I32)
    pdf = jnp.ones((n,), jnp.float32)
    for k in range(tree.depth):
        if tree.pair:
            rows = tree.pair[k][idx]                    # (N, 16)
            rt = v3.rows_to_planes(rows)
            wl = _importance_t(rt, 0, p)
            wr = _importance_t(rt, 8, p)
        else:  # legacy trees (no pair tables)
            wl = _importance(tree.bmin[k + 1], tree.bmax[k + 1],
                             tree.energy[k + 1], tree.energy_dir[k + 1],
                             2 * idx, p)
            wr = _importance(tree.bmin[k + 1], tree.bmax[k + 1],
                             tree.energy[k + 1], tree.energy_dir[k + 1],
                             2 * idx + 1, p)
        total = wl + wr
        pl = jnp.where(total > 0, wl / jnp.maximum(total, 1e-30), 0.5)
        take_l = u < pl
        # Sample re-use (rescale the survived interval) keeps one
        # uniform per pick regardless of depth.
        u = jnp.clip(jnp.where(take_l, u / jnp.maximum(pl, 1e-12),
                               (u - pl) / jnp.maximum(1.0 - pl, 1e-12)),
                     0.0, 1.0 - 1e-7)
        pdf = pdf * jnp.where(take_l, pl, 1.0 - pl)
        idx = jnp.where(take_l, 2 * idx, 2 * idx + 1)
    return tree.perm[idx], pdf


def process_light_rows(rows: jnp.ndarray, p: V3):
    """Vectorized processLight where every ray carries its OWN gathered
    light row (N, LIGHT_W) — the per-ray counterpart of
    models/lights.process_light_one (same semantics, rows transposed
    once so each field is a plane)."""
    from ..models.lights import COS_CONE, DIRECTIONAL, POINT, SPOT, TYPE

    rt = rows.T
    lint = rt[6]
    ltype = rt[TYPE]
    ldir = V3(rt[8], rt[9], rt[10])
    has_dir = v3.dot(ldir, ldir) > 1e-12

    to_light_pt = V3(rt[0] - p.x, rt[1] - p.y, rt[2] - p.z)
    d2 = v3.dot(to_light_pt, to_light_pt)
    falloff = lint / jnp.maximum(d2, 1e-12)

    is_point = ltype == POINT
    is_spot = ltype == SPOT
    is_dir = ltype == DIRECTIONAL

    axis = ldir * (1.0 / jnp.maximum(jnp.sqrt(v3.dot(ldir, ldir)),
                                     1e-12))
    cos_to = v3.dot(-to_light_pt, axis) / jnp.maximum(jnp.sqrt(d2),
                                                      1e-12)
    in_cone = cos_to >= rt[COS_CONE]
    spot_int = falloff * in_cone.astype(jnp.float32)

    from ..models.lights import _DEFAULT_DIR

    fixed = V3(*(jnp.full_like(p.x, c) for c in _DEFAULT_DIR))
    dir_to_light = v3.where(has_dir, -ldir, fixed)

    intensity = jnp.where(is_point, falloff,
                          jnp.where(is_spot & has_dir, spot_int, lint))
    direction = v3.where(is_point | is_spot, to_light_pt, dir_to_light)
    unbounded = is_dir & has_dir
    color = V3(rt[3], rt[4], rt[5])
    return direction, color, intensity, unbounded
