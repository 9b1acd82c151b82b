"""Scene building: OBJ parsing/dedup/Y-flip, instance transforms, SoA
flattening — semantics of Graphics/RayTracing/Scene.cpp:29-120."""
import numpy as np

from hrt_tpu.models import mesh as mesh_mod
from hrt_tpu.models.instance import MeshInstance, trs_matrix
from hrt_tpu.models.scene import Scene, reference_demo_scene

OBJ_QUAD = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 1//1 3//1 4//1
"""


def test_obj_load_yflip_and_dedup():
    m = mesh_mod.load_obj(OBJ_QUAD, is_text=True)
    # 4 unique vertices (dedup across the two faces), 2 triangles
    assert m.num_vertices == 4
    assert m.num_triangles == 2
    # Y negated on load (Scene.cpp:49)
    ys = m.vertices[:, 1]
    assert (ys <= 0).all() and ys.min() == -1.0
    # normals y-flipped too (all (0,0,1) stays, but check formula)
    np.testing.assert_allclose(m.vertices[:, 3:6],
                               np.tile([[0, 0, 1]], (4, 1)))


def test_obj_negative_indices_and_quads():
    text = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n"
    m = mesh_mod.load_obj(text, is_text=True)
    assert m.num_triangles == 2  # fan triangulation


def test_trs_identity_is_scale_translate():
    m = trs_matrix((1, 2, 3), (0, 0, 0), (2, 2, 2))
    want = np.array([[2, 0, 0, 1], [0, 2, 0, 2], [0, 0, 2, 3]], np.float32)
    np.testing.assert_allclose(m, want, atol=1e-6)


def test_instance_inverse():
    inst = MeshInstance(0, 0, (1, -2, 3), (0.3, 1.1, -0.4), (2, 1, 0.5))
    m = inst.transform
    inv = inst.inverse_transform
    p = np.array([0.7, -0.2, 1.5], np.float32)
    world = m[:, :3] @ p + m[:, 3]
    back = inv[:, :3] @ world + inv[:, 3]
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_normal_matrix_preserves_perpendicularity():
    inst = MeshInstance(0, 0, (0, 0, 0), (0.2, 0.5, 0.1), (2, 1, 3))
    m = inst.transform[:, :3]
    nm = inst.normal_matrix
    # tangent t perpendicular to n stays perpendicular after transform
    n = np.array([0.0, 1.0, 0.0])
    t = np.array([1.0, 0.0, 0.0])
    tn = m @ t
    nn = nm @ n
    assert abs(np.dot(tn, nn)) < 1e-5


def test_scene_build_shapes_and_padding():
    sc = reference_demo_scene()
    data = sc.build()
    t = data.num_triangles
    assert t % 128 == 0
    # 2 instances x 2 tris = 4 real triangles
    assert float(np.asarray(data.tri_valid).sum()) == 4.0
    assert data.materials.shape[0] == 2
    assert data.lights.shape[0] == 3
    # padding rows are degenerate
    e1 = np.asarray(data.tri_e1)[4:]
    assert (e1 == 0).all()
    # instance ids: -1 padding
    inst = np.asarray(data.tri_inst)
    assert (inst[:4] >= 0).all() and (inst[4:] == -1).all()


def test_scene_instance_transform_applied():
    sc = Scene()
    sc.add_mesh(mesh_mod.plane(1.0))
    sc.create_material()
    sc.create_instance(0, 0, position=(0, 5, 0), scale=(4, 1, 4))
    data = sc.build()
    v0 = np.asarray(data.tri_v0)[:2]
    assert np.allclose(v0[:, 1], 5.0)
    assert np.abs(v0[:, 0]).max() == 4.0


def test_material_defaults():
    sc = Scene()
    sc.create_material((1, 0, 0), 0.7)
    from hrt_tpu.models import materials as M

    m = sc.materials[0]
    assert m[M.METALLIC] == np.float32(0.7)
    assert m[M.ROUGHNESS] == np.float32(1.0)
    assert m[M.SPECULAR] == np.float32(0.5)  # default, ref Scene.h:56
