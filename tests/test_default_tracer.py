"""End-to-end default path-tracer tests on a tiny Cornell render."""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu import config
from rlrpt_tpu.camera import Camera
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.scene.presets import get as get_preset
from rlrpt_tpu.utils.image import mape_score, tonemap


def _render(seed=0, w=64, h=64, spp=4, bounces=6):
    cfg = config.RenderConfig(width=w, height=h, samples_per_pixel=spp,
                              max_ray_bounces=bounces, ray_tile=4096)
    scene = cornell_box()
    cam = Camera.create(get_preset("cornell").camera_position)
    img, aux = render_default(jax.random.PRNGKey(seed), scene, cam, cfg)
    return np.asarray(img), aux


def test_render_shape_and_finiteness():
    img, aux = _render()
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    assert img.max() > 0.05  # scene is lit
    apl = float(aux["avg_path_length"])
    assert 1.0 < apl <= 6.0


def test_light_visible_and_bright():
    img, _ = _render(spp=8)
    # The ceiling light (top of image) must be the brightest region and
    # close to its emission value 12.6 where directly visible.
    top = img[: img.shape[0] // 4].mean()
    bottom = img[-img.shape[0] // 4:].mean()
    assert top > bottom
    assert img.max() > 5.0  # direct light hit ~ 12.6


def test_deterministic_given_seed():
    a, _ = _render(seed=7)
    b, _ = _render(seed=7)
    np.testing.assert_array_equal(a, b)


def test_seed_variation_is_noise_sized():
    a, _ = _render(seed=1, spp=8)
    b, _ = _render(seed=2, spp=8)
    # different seeds give the same image up to MC noise: strongly correlated
    assert not np.array_equal(a, b)
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.8
    # and the MAPE metric itself behaves (identical image scores 0)
    t = tonemap(a).astype(np.int64)
    assert mape_score(t, t) == 0.0
