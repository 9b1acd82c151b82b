"""End-to-end frame program tests (config 1/2 of BASELINE.json)."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.config import RenderConfig
from hrt_tpu.models.camera import Camera
from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene, reference_demo_scene
from hrt_tpu.renderer import camera_arrays, render, render_frame

SMALL = dict(width=64, height=48)


def demo_scene():
    sc = reference_demo_scene()
    return sc


def test_primary_render_runs_and_hits():
    cfg = RenderConfig(max_depth=1, sky=False, **SMALL)
    img = render(demo_scene(), Camera(), cfg)
    assert img.shape == (48, 64, 3)
    assert np.isfinite(img).all()
    # lights exist -> some nonzero pixels
    assert img.max() > 0.0


def test_miss_is_black_in_parity_mode():
    sc = Scene()
    sc.add_mesh(plane(0.01))  # tiny plane: most rays miss
    sc.create_material()
    sc.create_instance(0, 0, position=(0, 50, 0))
    cfg = RenderConfig(max_depth=1, sky=False, **SMALL)
    img = render(sc, Camera(), cfg)
    assert (img == 0).mean() > 0.9


def test_sky_mode_nonblack_miss():
    sc = Scene()
    sc.add_mesh(plane(0.01))
    sc.create_material()
    sc.create_instance(0, 0, position=(0, 50, 0))
    cfg = RenderConfig(max_depth=1, sky=True, **SMALL)
    img = render(sc, Camera(), cfg)
    assert img.mean() > 0.01


def test_shadowing_darkens():
    """A blocker between light and plane must darken the shadowed area."""
    base = Scene()
    base.add_mesh(plane(2.0))
    base.create_material((1, 1, 1), 0.0, 1.0)
    base.create_instance(0, 0, position=(0, 1, 0))
    base.create_light((0, -2, 0), (1, 1, 1), 8.0)
    cfg = RenderConfig(max_depth=1, sky=False, **SMALL)
    cam = Camera(position=(0, -0.5, -3), rotation=(-0.35, 0, 0))
    img_nb = render(base, cam, cfg)

    blocked = Scene()
    blocked.add_mesh(plane(2.0))
    blocked.add_mesh(plane(0.5))
    blocked.create_material((1, 1, 1), 0.0, 1.0)
    blocked.create_instance(0, 0, position=(0, 1, 0))
    blocked.create_instance(1, 0, position=(0, -0.5, 0))  # blocker above
    blocked.create_light((0, -2, 0), (1, 1, 1), 8.0)
    img_b = render(blocked, cam, cfg)
    assert img_b.sum() < img_nb.sum() * 0.98


def test_light_falloff_inverse_square():
    sc = Scene()
    sc.add_mesh(plane(4.0))
    sc.create_material((1, 1, 1), 0.0, 1.0)
    sc.create_instance(0, 0, position=(0, 1, 0))
    sc.create_light((0, 0.0, 0), (1, 1, 1), 1.0)  # 1 unit above plane
    cfg = RenderConfig(max_depth=1, sky=False, **SMALL)
    cam = Camera(position=(0, -1, -4), rotation=(-0.4, 0, 0))
    img1 = render(sc, cam, cfg)

    sc2 = Scene()
    sc2.add_mesh(plane(4.0))
    sc2.create_material((1, 1, 1), 0.0, 1.0)
    sc2.create_instance(0, 0, position=(0, 1, 0))
    sc2.create_light((0, -1.0, 0), (1, 1, 1), 1.0)  # 2 units above plane
    img2 = render(sc2, cam, cfg)
    assert img2.max() < img1.max()


def test_render_deterministic():
    cfg = RenderConfig(max_depth=1, **SMALL)
    a = render(demo_scene(), Camera(), cfg, frame=0)
    b = render(demo_scene(), Camera(), cfg, frame=0)
    np.testing.assert_array_equal(a, b)


def test_indirect_adds_energy():
    """GI must add light relative to direct-only in an enclosed scene."""
    def build():
        sc = Scene()
        sc.add_mesh(plane(2.0))
        sc.create_material((0.8, 0.8, 0.8), 0.0, 1.0)
        sc.create_instance(0, 0, position=(0, 1, 0))
        # wall reflecting light back
        sc.create_instance(0, 0, position=(0, -1, 0), rotation=(np.pi, 0, 0))
        sc.create_light((0.5, 0, 0.0), (1, 1, 1), 4.0)
        return sc

    cam = Camera(position=(0, 0, -3.5))
    direct = render(build(), cam,
                    RenderConfig(max_depth=1, **SMALL))
    gi = render(build(), cam,
                RenderConfig(max_depth=3, indirect=True, spp=2,
                             jitter=True, **SMALL))
    assert np.isfinite(gi).all()
    assert gi.sum() > direct.sum()


def test_sorted_wavefront_matches_unsorted():
    """config.sort_bounces co-sorts the whole wavefront by the 6-D
    Morton (origin, direction) key and sorts radiance back by pixel
    index — output must match the unsorted path to float-reassociation
    tolerance (renderer.trace_paths round-3 design; key A/B in
    scripts/sortkey_ab.py)."""
    def build():
        sc = Scene()
        sc.add_mesh(plane(2.0))
        sc.create_material((0.8, 0.8, 0.8), 0.0, 1.0)
        sc.create_instance(0, 0, position=(0, 1, 0))
        sc.create_instance(0, 0, position=(0, -1, 0),
                           rotation=(np.pi, 0, 0))
        sc.create_light((0.5, 0, 0.0), (1, 1, 1), 4.0)
        return sc

    cam = Camera(position=(0, 0, -3.5))
    base = RenderConfig(max_depth=3, indirect=True, **SMALL)
    import dataclasses

    plain = render(build(), cam, base)
    srt = render(build(), cam,
                 dataclasses.replace(base, sort_bounces=True))
    np.testing.assert_allclose(srt, plain, rtol=1e-4, atol=1e-5)


def test_shadow_interleave_matches_lightmajor():
    """Block-interleaved 2-light shadow batches (shadow_interleave)
    must render identically to light-major concatenation.  128x64 =
    8192 rays makes the batch walk-tile aligned so the interleave
    path actually engages."""
    import dataclasses

    cfg = RenderConfig(width=128, height=64, max_depth=1, sky=False,
                       traversal="bvh")
    # traversal=bvh skips the pallas kernel on CPU but the interleave
    # gate requires pallas/auto — use auto (non-pallas fallback still
    # routes the planes through the same layout).
    cfg = dataclasses.replace(cfg, traversal="auto")
    img_on = render(demo_scene(), Camera(), cfg)
    img_off = render(demo_scene(), Camera(),
                     dataclasses.replace(cfg, shadow_interleave=False))
    np.testing.assert_array_equal(img_on, img_off)


def test_shade_attrs_material_select_matches_gather():
    """The narrow-gather material-select path (materials= kwarg of
    _shade_attrs_p) must produce bit-identical normals/MatP/uv to the
    full 36-column gather, with mat_rows replaced by the texture-id
    plane."""
    import jax.numpy as jnp

    from hrt_tpu.models import materials as M
    from hrt_tpu.ops import lbvh
    from hrt_tpu.renderer import _hit_attr_table, _shade_attrs_p

    sc = demo_scene()
    scene = sc.build()
    accel = lbvh.build_bvh(scene, leaf_size=8)
    tab = _hit_attr_table(accel)
    n_tri = tab.shape[0]
    rng = np.random.RandomState(3)
    tri = jnp.asarray(rng.randint(0, n_tri, 256), jnp.int32)
    u = jnp.asarray(rng.rand(256).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.rand(256).astype(np.float32) * 0.5)
    n0, m0, rows0, uv0 = _shade_attrs_p(tab, tri, u, v)
    n1, m1, rows1, uv1 = _shade_attrs_p(tab, tri, u, v,
                                        materials=scene.materials)
    assert rows1.ndim == 1
    np.testing.assert_array_equal(np.asarray(n0.x), np.asarray(n1.x))
    np.testing.assert_array_equal(np.asarray(uv0[0]), np.asarray(uv1[0]))
    np.testing.assert_array_equal(
        np.asarray(rows0[:, M.BASE_COLOR_TEX]), np.asarray(rows1))
    for f0, f1 in zip(m0, m1):
        if hasattr(f0, "x"):
            for c in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(f0, c)),
                    np.asarray(getattr(f1, c)))
        else:
            np.testing.assert_array_equal(np.asarray(f0),
                                          np.asarray(f1))


def test_jit_cache_reuse():
    """Same config -> one compilation (cache hit on second call)."""
    cfg = RenderConfig(max_depth=1, **SMALL)
    sc = demo_scene().build()
    cams = camera_arrays(Camera(), cfg)
    f1 = render_frame(sc, None, cams, jnp.uint32(0), cfg)
    f2 = render_frame(sc, None, cams, jnp.uint32(1), cfg)
    assert f1.shape == f2.shape


def test_render_frames_matches_per_frame():
    """render_frames (k frames per dispatch, the frames-in-flight
    analogue) must produce exactly the per-frame results."""
    from hrt_tpu.renderer import render_frames

    cfg = RenderConfig(max_depth=1, **SMALL)
    sc = demo_scene().build()
    cams = camera_arrays(Camera(), cfg)
    stack = render_frames(sc, None, cams, jnp.uint32(0), 3, cfg)
    assert stack.shape == (3, cfg.height, cfg.width, 3)
    for i in range(3):
        one = render_frame(sc, None, cams, jnp.uint32(i), cfg)
        np.testing.assert_allclose(np.asarray(stack[i]), np.asarray(one),
                                   rtol=1e-6, atol=1e-6)


def test_spp_above_two_renders():
    """Regression: the per-sample seed constant overflowed uint32 at
    spp >= 3 (s * 0x9E3779B9 exceeds 2^32 for s = 2)."""
    import numpy as np
    import bench
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.renderer import render

    cfg = RenderConfig(width=16, height=12, max_depth=1, spp=4,
                       jitter=True, sky=True, traversal="bvh")
    img = render(bench.build_bench_scene(),
                 Camera(position=(0.0, -1.0, -6.0)), cfg)
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_walk_block_ordering_roundtrip():
    """to_walk_blocks: each 1024-ray chunk is one compact pixel block
    (the per-WALK frustum); inverse restores row-major order."""
    import numpy as np
    from hrt_tpu.ops import wavefront as wf

    h, w = 256, 384
    ph, pw, gh, gw = wf.walk_block_geometry(8, 8)
    assert (ph, pw, gh, gw) == (32, 32, 4, 2)
    x = jnp.arange(h * w, dtype=jnp.int32)
    y = wf.to_walk_blocks(x, h, w, ph, pw, gh, gw)
    assert (wf.from_walk_blocks(y, h, w, ph, pw, gh, gw) == x).all()
    c = np.asarray(y).reshape(-1, ph * pw)
    ys, xs = c // w, c % w
    assert (ys.max(1) - ys.min(1) == ph - 1).all()
    assert (xs.max(1) - xs.min(1) == pw - 1).all()


def test_walk_block_render_parity():
    """Rendering with the nested walk-block ray order (8 independent
    32x32-block walks per kernel block) must match the unblocked
    order (same rays, same per-ray math).  Subprocess because the
    kernel geometry constants are bound at import time."""
    import os
    import subprocess
    import sys

    code = """
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp, dataclasses
import bench
from hrt_tpu.config import RenderConfig
from hrt_tpu.models.camera import Camera
from hrt_tpu.renderer import camera_arrays, render_frame
from hrt_tpu.ops import lbvh
scene = bench.build_bench_scene().build()
accel = lbvh.build_bvh_sah(scene, leaf_size=16)
cfg = RenderConfig(width=512, height=384, max_depth=1, sky=True)
cams = camera_arrays(Camera(position=(0,-1,-6), rotation=(-0.15,0,0)), cfg)
img = np.asarray(render_frame(scene, accel, cams, jnp.uint32(0), cfg))
ref = np.asarray(render_frame(scene, accel, cams, jnp.uint32(0),
                              dataclasses.replace(cfg, block_reorder=False)))
assert np.abs(img - ref).max() < 1e-3, np.abs(img - ref).max()
print('parity-ok')
"""
    env = dict(os.environ, HRT_TILE_ROWS="8", HRT_WALKS="8",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "parity-ok" in out.stdout
