"""Smart-Culling pre-pass: footprint math, hysteresis, render impact."""
import numpy as np
import jax.numpy as jnp

from hrt_tpu.config import RenderConfig
from hrt_tpu.models.camera import Camera
from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import culling, lbvh, traversal
from hrt_tpu.renderer import camera_arrays


def scene_with_tiny_instance():
    sc = Scene()
    s = sc.add_mesh(icosphere(1))
    m = sc.create_material()
    sc.create_instance(s, m)                                   # big
    sc.create_instance(s, m, position=(0.5, 0, 0), scale=(1e-4,) * 3)
    return sc.build()


def cams(cfg):
    return camera_arrays(Camera(position=(0, 0, -4)), cfg)


def test_footprint_ordering():
    cfg = RenderConfig(width=320, height=240)
    data = scene_with_tiny_instance()
    area = np.asarray(culling.footprint_px(
        data.inst_bmin, data.inst_bmax, cams(cfg), cfg.width, cfg.height))
    assert area[0] > 1000.0      # unit sphere fills many pixels
    assert area[1] < 1.0         # 1e-4-scale instance is sub-pixel


def test_near_instances_never_culled():
    cfg = RenderConfig(width=320, height=240)
    sc = Scene()
    s = sc.add_mesh(icosphere(0))
    m = sc.create_material()
    sc.create_instance(s, m, position=(0, 0, -4))  # surrounds camera
    data = sc.build()
    area = np.asarray(culling.footprint_px(
        data.inst_bmin, data.inst_bmax, cams(cfg), cfg.width, cfg.height))
    assert np.isinf(area[0])


def test_hysteresis():
    cfg = RenderConfig(width=320, height=240)
    data = scene_with_tiny_instance()
    vis = jnp.asarray([True, True])
    new = culling.cull_instances(vis, data.inst_bmin, data.inst_bmax,
                                 cams(cfg), cfg.width, cfg.height,
                                 threshold_px=1.0)
    assert bool(new[0]) and not bool(new[1])
    # In the hysteresis band (between thr and thr*2) keep previous state
    area = culling.footprint_px(data.inst_bmin, data.inst_bmax,
                                cams(cfg), cfg.width, cfg.height)
    band_thr = float(area[0]) / 1.5  # big instance inside its band
    keep_prev = culling.cull_instances(
        jnp.asarray([False, False]), data.inst_bmin, data.inst_bmax,
        cams(cfg), cfg.width, cfg.height, threshold_px=band_thr)
    assert not bool(keep_prev[0])  # was hidden, stays hidden in band


def test_culled_instance_invisible_in_trace():
    data = scene_with_tiny_instance()
    vis = jnp.asarray([False, True])   # cull the BIG instance
    mask = culling.triangle_mask(vis, data.tri_inst, data.tri_valid)
    accel = lbvh.build_bvh(data, leaf_size=8, tri_mask=mask)
    o = jnp.asarray([[0.0, 0.0, -4.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, tri, _, _ = traversal.closest_hit_bvh(data, accel, o, d, 1e-3,
                                             1e32, use_pallas=False)
    assert int(tri[0]) == -1  # big sphere culled -> ray passes through
    accel_full = lbvh.build_bvh(data, leaf_size=8)
    t2, tri2, _, _ = traversal.closest_hit_bvh(data, accel_full, o, d,
                                               1e-3, 1e32,
                                               use_pallas=False)
    assert int(tri2[0]) >= 0
