"""Sampled many-light NEE converges to the all-lights reference, and
the PBR material model renders."""
import dataclasses

import numpy as np

from hrt_tpu.config import RenderConfig
from hrt_tpu.models.camera import Camera
from hrt_tpu.models.mesh import plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.renderer import render


def many_light_scene(n_lights=12):
    rs = np.random.RandomState(0)
    sc = Scene()
    sc.add_mesh(plane(3.0))
    sc.create_material((0.8, 0.8, 0.8), 0.0, 1.0)
    sc.create_instance(0, 0, position=(0, 1, 0))
    for i in range(n_lights):
        pos = (rs.uniform(-2, 2), rs.uniform(-2.5, -0.5), rs.uniform(-2, 2))
        col = rs.uniform(0.2, 1.0, 3)
        sc.create_light(pos, tuple(col), rs.uniform(0.5, 3.0))
    return sc


SMALL = dict(width=48, height=32, max_depth=1)


def test_sampled_nee_unbiased():
    cam = Camera(position=(0, -1, -4), rotation=(-0.3, 0, 0))
    ref = render(many_light_scene(), cam, RenderConfig(**SMALL))
    # Average many sampled frames (different seeds via frame index)
    cfg_s = RenderConfig(light_samples=2, **SMALL)
    acc = np.zeros_like(ref)
    n = 24
    for f in range(n):
        acc += render(many_light_scene(), cam, cfg_s, frame=f)
    acc /= n
    lit = ref.max(-1) > 0.02
    rel = np.abs(acc - ref)[lit] / (ref[lit] + 0.05)
    assert rel.mean() < 0.15, rel.mean()


def test_sampled_nee_runs_with_one_sample():
    cam = Camera(position=(0, -1, -4), rotation=(-0.3, 0, 0))
    img = render(many_light_scene(), cam,
                 RenderConfig(light_samples=1, **SMALL))
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_pbr_material_model():
    cam = Camera(position=(0, -1, -4), rotation=(-0.3, 0, 0))
    sc = many_light_scene(3)
    img_d = render(sc, cam, RenderConfig(brdf="disney", **SMALL))
    img_p = render(sc, cam, RenderConfig(brdf="pbr", **SMALL))
    assert np.isfinite(img_p).all()
    assert img_p.max() > 0.0
    # Same lighting, different models: similar energy scale
    assert 0.3 < img_p.sum() / img_d.sum() < 3.0
