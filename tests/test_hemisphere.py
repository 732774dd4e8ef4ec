"""Unit tests for the Chiu concentric map and hemisphere sampling
(behaviour pinned against the reference hemisphere_helpers.cu:8-226)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.ops.linalg import make_frame, frame_to_world


def chiu_map_scalar(x, y):
    """Direct scalar implementation of Kenneth Chiu's public concentric map,
    with the same octant structure as the reference (hemisphere_helpers.cu:
    134-226), used as the test oracle."""
    x = 2 * x - 1
    y = 2 * y - 1
    if y > -x:
        if y < x:
            xx = x
            if y > 0:
                offset, yy = 0.0, y
            else:
                offset, yy = 7 * math.pi / 4, x + y
        else:
            xx = y
            if x > 0:
                offset, yy = math.pi / 4, y - x
            else:
                offset, yy = math.pi / 2, -x
    else:
        if y > x:
            xx = -x
            if y > 0:
                offset, yy = 3 * math.pi / 4, -x - y
            else:
                offset, yy = math.pi, -y
        else:
            xx = -y
            if x > 0:
                offset, yy = 3 * math.pi / 2, x
            else:
                if y != 0:
                    offset, yy = 5 * math.pi / 4, x - y
                else:
                    return (0.0, 1.0, 0.0)
    theta = math.acos(1 - xx * xx)
    phi = offset + (math.pi / 4) * (yy / xx)
    return (math.sin(theta) * math.cos(phi), math.cos(theta),
            math.sin(theta) * math.sin(phi))


def test_concentric_map_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    pts = rng.random((500, 2))
    got = np.asarray(hs.concentric_map(jnp.asarray(pts[:, 0], jnp.float32),
                                       jnp.asarray(pts[:, 1], jnp.float32)))
    want = np.asarray([chiu_map_scalar(float(x), float(y)) for x, y in pts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_concentric_map_unit_upper_hemisphere():
    rng = np.random.default_rng(1)
    pts = rng.random((2000, 2))
    v = np.asarray(hs.concentric_map(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert (v[:, 1] >= -1e-6).all()


def test_concentric_map_origin_and_centre():
    v = np.asarray(hs.concentric_map(jnp.asarray(0.5), jnp.asarray(0.5)))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)
    v0 = np.asarray(hs.concentric_map(jnp.asarray(0.0), jnp.asarray(0.0)))
    np.testing.assert_allclose(np.linalg.norm(v0), 1.0, atol=1e-5)


def test_sector_cos_thetas_match_centre_dirs():
    g = 12
    cos = np.asarray(hs.sector_cos_thetas(g))
    dirs = np.asarray(hs.sector_centre_dirs_local(g))
    np.testing.assert_allclose(cos, dirs[:, 1], atol=1e-7)
    assert cos.shape == (144,)
    assert (cos >= 0).all() and (cos <= 1).all()


def test_frame_orthonormal_and_maps_y_to_normal():
    rng = np.random.default_rng(2)
    n = rng.normal(size=(100, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    f = np.asarray(make_frame(jnp.asarray(n, jnp.float32)))
    # rows orthonormal
    eye = np.einsum("bij,bkj->bik", f, f)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    # local y -> normal
    y = np.asarray(frame_to_world(jnp.asarray(f), jnp.asarray([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(y, n, atol=1e-5)


def test_grid_pos_to_direction_cos_equals_local_y():
    """cos(theta to normal) of a mapped grid dir == local y (the constant-
    table simplification used for CDF rebuilds)."""
    rng = np.random.default_rng(3)
    n = rng.normal(size=(50, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    f = make_frame(jnp.asarray(n, jnp.float32))
    gx = jnp.asarray(rng.random(50) * 12, jnp.float32)
    gy = jnp.asarray(rng.random(50) * 12, jnp.float32)
    d = np.asarray(hs.grid_pos_to_direction(gx, gy, f, 12))
    local = np.asarray(hs.grid_pos_to_local(gx, gy, 12))
    np.testing.assert_allclose(np.sum(d * n, axis=-1), local[:, 1], atol=1e-5)


def test_uniform_sampling_statistics():
    key = jax.random.PRNGKey(0)
    n = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (20000, 1))
    d, cos_t = hs.sample_uniform_direction(key, n)
    d = np.asarray(d)
    cos = np.asarray(cos_t)
    # all on the correct hemisphere and cos_theta consistent
    np.testing.assert_allclose(np.sum(d * np.asarray(n), axis=-1), cos, atol=1e-5)
    assert (cos >= 0).all()
    # E[cos_theta] = 0.5 for uniform r1
    assert abs(cos.mean() - 0.5) < 0.01
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_sample_sector_direction_lands_in_sector():
    """Jittered sector sampling must invert back to the same sector index
    through the map's radial structure (smoke: dirs normalized, cos>=0)."""
    key = jax.random.PRNGKey(1)
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 144, jnp.float32)
    f = make_frame(n)
    idx = jnp.arange(144)
    d = np.asarray(hs.sample_sector_direction(key, idx, f, 12))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 1] >= -1e-6).all()
