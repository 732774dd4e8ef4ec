"""Multi-scene sharded batch render tests (8-device virtual CPU mesh)."""

import jax
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.parallel.multiscene import (pad_scene, render_multiscene_dp,
                                           stack_scenes)
from rlrpt_tpu.scene import cornell_box, presets

_CFG = RenderConfig(width=20, height=20, samples_per_pixel=2,
                    max_ray_bounces=3, ray_tile=512)


def test_pad_scene_preserves_render():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    padded = pad_scene(scene, scene.n_surfaces + 7, scene.n_lights + 3)
    img0, _ = render_default(jax.random.PRNGKey(0), scene, cam, _CFG)
    img1, _ = render_default(jax.random.PRNGKey(0), padded, cam, _CFG)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-4, atol=1e-5)


def test_multiscene_batch_renders():
    names = ["cornell", "box", "simple_room"]
    scenes, cams = [], []
    for n in names:
        p = presets.get(n)
        scenes.append(p.load())
        cams.append(Camera.create(p.camera_position))
    imgs = render_multiscene_dp(jax.random.PRNGKey(0), scenes, cams, _CFG)
    imgs = np.asarray(imgs)
    assert imgs.shape == (3, 20, 20, 3)
    assert np.isfinite(imgs).all()
    # cornell render agrees with the single-scene path statistically
    solo, _ = render_default(jax.random.PRNGKey(1), scenes[0], cams[0], _CFG)
    assert abs(imgs[0].mean() - float(np.asarray(solo).mean())) < 0.5 * max(
        float(np.asarray(solo).mean()), 1e-3)
