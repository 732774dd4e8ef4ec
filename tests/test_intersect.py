"""Ray-triangle closest hit tests (semantics pinned to ray.cu:17-141)."""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.ops.intersect import INF, closest_hit
from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, build_scene
from rlrpt_tpu.scene import cornell_box


def _single_tri_scene():
    # unit triangle in z=2 plane as surface; light quad behind it at z=5
    sv0 = [[-1, -1, 2.0]]
    sv1 = [[1, -1, 2.0]]
    sv2 = [[0, 1, 2.0]]
    rgb = [[0.75, 0.75, 0.75]]
    lv0 = [[-5, -5, 5.0]]
    lv1 = [[5, -5, 5.0]]
    lv2 = [[0, 5, 5.0]]
    lp = [[8.0, 8.0, 8.0]]
    return build_scene(sv0, sv1, sv2, rgb, lv0, lv1, lv2, lp)


def test_hit_analytic():
    s = _single_tri_scene()
    o = jnp.zeros((3, 3), jnp.float32)
    d = jnp.asarray([
        [0.0, 0.0, 1.0],                 # straight at both triangles
        [2.0, 0.0, 5.0],                 # misses small tri, hits the light
        [0.0, -1.0, 0.0],                # misses everything
    ], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h = closest_hit(o, d, s)
    # ray 0 hits the closer surface triangle at t=2
    assert int(h.hit_type[0]) == SURFACE
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.position[0]), [0, 0, 2], atol=1e-5)
    # ray 1 passes outside the small tri (x=0.8 at z=2) but inside the light
    assert int(h.hit_type[1]) == AREA_LIGHT
    np.testing.assert_allclose(np.asarray(h.position[1]), [2, 0, 5], atol=1e-4)
    # ray 2 heads away from everything
    assert int(h.hit_type[2]) == NOTHING


def test_miss_returns_nothing():
    s = _single_tri_scene()
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = closest_hit(o, d, s)
    assert int(h.hit_type[0]) == NOTHING
    assert float(h.t[0]) >= float(INF)


def test_backface_hits_count():
    """The reference has no backface culling (any det != 0 qualifies)."""
    s = _single_tri_scene()
    o = jnp.asarray([[0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = closest_hit(o, d, s)
    assert int(h.hit_type[0]) == SURFACE
    np.testing.assert_allclose(float(h.t[0]), 1.0, rtol=1e-5)


def test_closest_wins_and_tile_padding():
    s = cornell_box()
    # camera at the reference cornell position looking forward
    n = 1000
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -0.5]]), (n, 1))
    h_full = closest_hit(o, d, s, ray_tile=4096)
    h_tiled = closest_hit(o, d, s, ray_tile=128)
    np.testing.assert_allclose(np.asarray(h_full.t), np.asarray(h_tiled.t),
                               rtol=1e-6)
    assert (np.asarray(h_full.tri) == np.asarray(h_tiled.tri)).all()
    # the cornell box is open on the camera side (no front wall): every ray
    # with a forward component must hit, backward rays may escape
    fwd = np.asarray(d)[:, 2] > 0.3
    assert (np.asarray(h_full.hit_type)[fwd] != NOTHING).all()
    assert (np.asarray(h_full.hit_type) == NOTHING).any()


def test_cornell_forward_ray_hits_back_wall():
    s = cornell_box()
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = closest_hit(o, d, s)
    assert int(h.hit_type[0]) == SURFACE
    # back wall is at z = 1
    np.testing.assert_allclose(float(h.position[0, 2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(h.t[0]), 4.0, atol=1e-5)
