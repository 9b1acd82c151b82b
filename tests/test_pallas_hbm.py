"""HBM-streamed leaf fetch (big-scene mode) matches the VMEM path."""
import numpy as np
import jax.numpy as jnp

import hrt_tpu.ops.traversal_pallas as tp
from hrt_tpu.models.mesh import icosphere, plane
from hrt_tpu.models.scene import Scene
from hrt_tpu.ops import lbvh, traversal


def test_hbm_leaf_path_matches(monkeypatch):
    sc = Scene()
    s = sc.add_mesh(icosphere(2))
    m = sc.create_material()
    sc.create_instance(s, m)
    p = sc.add_mesh(plane(4.0))
    sc.create_instance(p, m, position=(0, 1.2, 0))
    data = sc.build()
    accel = lbvh.build_bvh(data, leaf_size=8)

    rs = np.random.RandomState(9)
    n = 333  # unique ray count -> unique trace shape (fresh compile)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 5.0
    tgt = rs.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    monkeypatch.setattr(tp, "MAX_VMEM_F32", 100)  # force HBM leaf DMA
    t_h, i_h, u_h, v_h = tp.closest_hit(data, accel, o, d, 1e-3, 1e32)
    occ_h = tp.any_hit(data, accel, o, d, 1e-3,
                       jnp.full((n,), 3.0, jnp.float32))

    t_r, i_r, u_r, v_r = traversal.closest_hit_bvh(
        data, accel, o, d, 1e-3, 1e32, use_pallas=False)
    occ_r = traversal.any_hit_bvh(data, accel, o, d, 1e-3,
                                  jnp.full((n,), 3.0, jnp.float32),
                                  use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i_h), np.asarray(i_r))
    both = np.asarray(i_r) >= 0
    np.testing.assert_allclose(np.asarray(t_h)[both],
                               np.asarray(t_r)[both], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(occ_h), np.asarray(occ_r))
