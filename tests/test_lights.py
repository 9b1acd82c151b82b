"""Light types (point/spot/directional), scene editing, PBR BSDF."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.config import RenderConfig
from hrt_tpu.models import lights as L
from hrt_tpu.models.camera import Camera
from hrt_tpu.models.mesh import plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.renderer import render


def test_point_light_inverse_square():
    lights = jnp.asarray([L.make_light((0, -2, 0), (1, 1, 1), 8.0)])
    wp = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    dirs, col, inten, unb = L.process_light(lights, wp)
    # distances 2 and 4 -> intensities 2.0 and 0.5
    np.testing.assert_allclose(np.asarray(inten)[:, 0], [2.0, 0.5],
                               rtol=1e-5)
    assert not bool(unb[0])


def test_directional_light():
    lights = jnp.asarray([L.make_light(
        (0, 0, 0), (1, 1, 1), 3.0, L.DIRECTIONAL,
        direction=(0.0, 1.0, 0.0))])  # travels +y (down, y-down world)
    wp = jnp.asarray([[5.0, 0.0, 3.0]])
    dirs, col, inten, unb = L.process_light(lights, wp)
    np.testing.assert_allclose(np.asarray(dirs)[0, 0], [0, -1, 0],
                               atol=1e-6)  # to-light = -direction
    assert float(inten[0, 0]) == 3.0       # no falloff
    assert bool(unb[0])


def test_directional_without_direction_is_reference_fallback():
    lights = jnp.asarray([L.make_light((0, 0, 0), (1, 1, 1), 2.0,
                                       L.DIRECTIONAL)])
    wp = jnp.asarray([[1.0, 2.0, 3.0]])
    dirs, _, inten, unb = L.process_light(lights, wp)
    np.testing.assert_allclose(np.asarray(dirs)[0, 0], [0.9, -0.1, 0.0],
                               atol=1e-6)  # light.slang:37
    assert not bool(unb[0])


def test_spot_cone():
    lights = jnp.asarray([L.make_light(
        (0, -2, 0), (1, 1, 1), 8.0, L.SPOT, direction=(0, 1, 0),
        cone_angle=0.3)])
    inside = jnp.asarray([[0.0, 0.0, 0.0]])     # straight below
    outside = jnp.asarray([[3.0, 0.0, 0.0]])    # far off-axis
    _, _, i_in, _ = L.process_light(lights, inside)
    _, _, i_out, _ = L.process_light(lights, outside)
    assert float(i_in[0, 0]) > 0.0
    assert float(i_out[0, 0]) == 0.0


def test_directional_light_renders():
    sc = Scene()
    sc.add_mesh(plane(2.0))
    sc.create_material((1, 1, 1), 0.0, 1.0)
    sc.create_instance(0, 0, position=(0, 1, 0))
    sc.create_light((0, 0, 0), (1, 1, 1), 2.0, L.DIRECTIONAL,
                    direction=(0.2, 1.0, 0.0))
    img = render(sc, Camera(position=(0, -0.5, -3.5)),
                 RenderConfig(width=48, height=32, max_depth=1))
    assert img.max() > 0.01


def test_scene_destroy_apis():
    sc = Scene()
    m0 = sc.add_mesh(plane(1.0))
    m1 = sc.add_mesh(plane(2.0))
    a = sc.create_material((1, 0, 0))
    b = sc.create_material((0, 1, 0))
    sc.create_instance(m0, a)
    sc.create_instance(m1, b)
    sc.create_light((0, -1, 0), (1, 1, 1), 1.0)
    sc.create_light((1, -1, 0), (1, 1, 1), 2.0)

    sc.destroy_light(0)
    assert len(sc.lights) == 1 and sc.lights[0][6] == 2.0
    sc.destroy_instance(0)
    assert len(sc.instances) == 1 and sc.instances[0].mesh_id == m1
    sc.unload_model(m0)  # removes mesh 0; instance of mesh 1 remaps to 0
    assert len(sc.meshes) == 1
    assert sc.instances[0].mesh_id == 0
    data = sc.build()
    assert data.num_triangles >= 2


def test_pbr_bsdf_basics():
    from hrt_tpu.models.materials import make_material
    from hrt_tpu.ops import pbr

    mat = jnp.asarray(make_material((0.8, 0.2, 0.2), 0.0, 0.7))[None]
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.6, 0.8]])
    l = jnp.asarray([[0.0, -0.6, 0.8]])
    f = np.asarray(pbr.bsdf_evaluate_simple(mat, n, v, l))
    assert (f >= 0).all() and np.isfinite(f).all()
    # below horizon -> zero
    l2 = jnp.asarray([[0.0, 0.0, -1.0]])
    np.testing.assert_array_equal(
        np.asarray(pbr.bsdf_evaluate_simple(mat, n, v, l2)), 0.0)
