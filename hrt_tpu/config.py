"""Render configuration.

The reference has no runtime config — everything is compile-time defines
(MAX_DEPTH RTPipeline.h:15, SAMPLES/MISS_DEPTH/LIGHT_TRESHOLD
shaders/constants.slang, window size RTApp.cpp:3, depthMax=2
RTApp.cpp:48).  Here those knobs are a frozen dataclass used as a static
jit argument, so each config compiles its own specialized frame program
— the XLA analogue of the reference's #define specialization.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 800                 # ref: RTApp.cpp:3 (800x600 window)
    height: int = 600
    spp: int = 1                     # ref: shaders/constants.slang:24
    max_depth: int = 2               # ref: RTApp.cpp:48 (depthMax)
    light_threshold: float = 1e-4    # ref: shaders/constants.slang:28
    sky: bool = False                # False = reference black-miss parity
    jitter: bool = False             # ref computes-but-drops jitter
    indirect: bool = False           # ref ships GGX bounce but weights 0
    russian_roulette: bool = True    # only used when indirect=True
    rr_start_depth: int = 2
    normal_offset: float = 1e-4      # ref: raytracing.slang:57 (+N*0.0001)
    bounce_offset: float = 1e-3      # ref: raytracing.slang:164 (+N*0.001)
    t_min: float = 1e-3              # ref: raytracing.slang:105
    traversal: str = "auto"          # bruteforce | bvh | pallas | auto
    # BVH leaf size (tris per leaf block).  0 = auto (32: measured
    # best for both coherent and sorted-bounce regimes -- round-3
    # probes and the round-5 leaf-16 re-measure in ROADMAP).
    leaf_size: int = 0
    tri_chunk: int = 512             # brute-force triangle chunk
    block_reorder: bool = True       # pixel-block ray reorder (see renderer)
    # Direction-sort bounce rays between trace stages.  Measured on
    # v5e: the argsort+gather overhead exceeds the coherence win at
    # <=1M rays (84 -> 110 ms/frame on the bench scene), so off by
    # default; useful for very deep incoherent paths.
    sort_bounces: bool = False
    brdf: str = "disney"             # disney | pbr (glTF metallic-rough)
    # Predicated Pallas shading (ops/shade_pallas.py): per-(8,128)-group
    # skip of the Disney evaluation for sky/back-facing/dead lanes.
    shade_pallas: bool = True
    # Many-light NEE: 0 = shadow ray per light (reference behavior,
    # raytracing.slang:77-85); N>0 = sample N lights per shading point
    # by unshadowed contribution (the light-BVH stand-in the reference
    # comments toward at raytracing.slang:76).
    light_samples: int = 0
    # Post pipeline (phase 5):
    denoise: bool = False
    upscale: int = 1                 # 1 = off, 2 = 2x learned upscale
    # "spatial" = residual CNN on the current frame only; "temporal" =
    # ray-reconstruction mode blending reprojected history (DLSS-RR
    # stand-in, ref: README.md / RTApp.cpp:162-163 markers).
    upscale_mode: str = "spatial"
    # Many-light NEE sampler: "cdf" = flat O(L) weight scan, "bvh" =
    # O(log L) light-BVH stochastic descent (ops/lightbvh.py), "auto" =
    # bvh past 384 lights (the measured crossover — lights_ab.py:
    # the O(L) scan is contiguous VPU work and beats the gather-bound
    # descent up to ~256 lights).  Only applies when light_samples > 0.
    light_sampler: str = "auto"
    accumulate: bool = False         # temporal accumulation across frames
    # Block-interleaved light-major shadow batches: each walk tile
    # holds the SAME hit-point chunk shadowing to all L lights, so the
    # lights' (heavily overlapping) walks merge — shared node visits,
    # one decision crossing (measured -5.4% on the bench shadow pass,
    # scripts/shadow_ilv_ab.py; occlusion bit-identical).  Applies when
    # L in {2,4,8} divides the walk tile and the batch is tile-aligned.
    shadow_interleave: bool = True
    # Trace finite-light shadow rays FROM the light toward the surface
    # (same segment, same answer): every ray in a pixel block then
    # shares one origin — tight point-source bundles (explored by the
    # since-culled frustum-interval kernel).  Default OFF: with the
    # packet kernel it buys nothing, and building the per-light origin
    # planes with concatenate (instead of the tile the off-path uses)
    # flips XLA's layout assignment for the whole shading graph and
    # costs ~2.2 ms/frame in relayout squeeze-reduces (measured,
    # bench scene; see ROADMAP round-2 campaign).
    shadow_from_light: bool = False

    @property
    def num_pixels(self) -> int:
        return self.width * self.height


# The five BASELINE.json benchmark configs.
CONFIGS = {
    "primary": RenderConfig(width=800, height=600, max_depth=1, sky=True),
    "whitted": RenderConfig(width=800, height=600, max_depth=4, sky=True,
                            indirect=True, russian_roulette=False),
    "mesh_bvh": RenderConfig(width=800, height=600, max_depth=2, sky=True,
                             traversal="pallas"),
    "path_tracing": RenderConfig(width=1920, height=1080, max_depth=5,
                                 sky=True, indirect=True, jitter=True,
                                 accumulate=True, traversal="pallas"),
    "animated_4k": RenderConfig(width=3840, height=2160, max_depth=3,
                                sky=True, indirect=True, jitter=True,
                                denoise=True, upscale=2,
                                traversal="pallas"),
    "reference_parity": RenderConfig(),
}
