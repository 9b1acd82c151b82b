"""Image textures: sampler math vs numpy, renderer integration."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.models import textures as tex


def test_sample_matches_numpy_nearest_grid():
    """Sampling exactly at texel coordinates returns the texel."""
    img = np.arange(4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3) / 48.0
    packed = jnp.asarray(tex.pack_textures([img], res=4))
    # u = (x)/r maps to texel column x; v is flipped (top-down rows).
    xs, ys = np.meshgrid(np.arange(4), np.arange(4), indexing="xy")
    u = jnp.asarray((xs.reshape(-1)) / 4.0)
    v = jnp.asarray(1.0 - (ys.reshape(-1)) / 4.0)
    tid = jnp.zeros((16,), jnp.int32)
    r, g, b = tex.sample_texture_p(packed, tid, u, v)
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    want = img[ys.reshape(-1) % 4, xs.reshape(-1)]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_untextured_is_identity():
    packed = jnp.asarray(tex.pack_textures([tex.checkerboard()], res=8))
    tid = jnp.full((5,), -1, jnp.int32)
    r, g, b = tex.sample_texture_p(packed, tid, jnp.zeros(5), jnp.zeros(5))
    np.testing.assert_allclose(np.asarray(r), 1.0)
    np.testing.assert_allclose(np.asarray(b), 1.0)


def test_rendered_checkerboard():
    """A checkerboard-textured plane shows the pattern in the frame."""
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.models.mesh import plane
    from hrt_tpu.models.scene import Scene
    from hrt_tpu.renderer import render

    sc = Scene()
    gnd = sc.add_mesh(plane(2.0))
    t = sc.create_texture(tex.checkerboard(n=4, res=32,
                                           a=(1, 1, 1), b=(0, 0, 0)))
    m = sc.create_material((1.0, 0.5, 0.25), 0.0, 1.0, texture=t)
    sc.create_instance(gnd, m, (0.0, 1.0, 0.0))
    sc.create_light((0.0, -3.0, 0.0), (1.0, 1.0, 1.0), 20.0)
    cam = Camera(position=(0.0, -2.5, 0.0), rotation=(-1.5707, 0.0, 0.0))
    cfg = RenderConfig(width=48, height=48, max_depth=1,
                       traversal="bvh")
    img = render(sc, cam, cfg)
    lum = img.mean(-1)
    lit = lum > 1e-4
    assert lit.mean() > 0.5  # plane fills the view
    bright = lum[lit] > np.median(lum[lit])
    # A checkerboard has both bright and dark lit pixels in quantity.
    assert 0.2 < bright.mean() < 0.8
    # Contrast between checker cells is strong (dark cells ~0).
    lo, hi = np.quantile(lum[lit], [0.2, 0.8])
    assert hi > 5 * max(lo, 1e-6), (lo, hi)


def test_rendered_untextured_unchanged():
    """Adding an unused texture to the scene leaves flat materials
    bit-identical (gated multiply is exact identity)."""
    from hrt_tpu.config import RenderConfig
    from hrt_tpu.models.camera import Camera
    from hrt_tpu.models.mesh import plane
    from hrt_tpu.models.scene import Scene
    from hrt_tpu.renderer import render

    def build(with_tex):
        sc = Scene()
        gnd = sc.add_mesh(plane(2.0))
        if with_tex:
            sc.create_texture(tex.checkerboard())
        m = sc.create_material((0.6, 0.7, 0.8), 0.0, 1.0)
        sc.create_instance(gnd, m, (0.0, 1.0, 0.0))
        sc.create_light((0.0, -3.0, 0.0), (1.0, 1.0, 1.0), 20.0)
        return sc

    cam = Camera(position=(0.0, -2.5, 0.0), rotation=(-1.5707, 0.0, 0.0))
    cfg = RenderConfig(width=32, height=32, max_depth=1,
                       traversal="bvh")
    a = render(build(False), cam, cfg)
    b = render(build(True), cam, cfg)
    np.testing.assert_allclose(a, b, atol=1e-6)
