"""End-to-end pixel gradients through the renderer."""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.integrators.differentiable import (pixel_gradients,
                                                  render_diff)
from rlrpt_tpu.scene import cornell_box

_CFG = RenderConfig(width=24, height=24, samples_per_pixel=2,
                    max_ray_bounces=4, ray_tile=1024)


def test_render_diff_matches_default():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    img_d, _ = render_default(jax.random.PRNGKey(0), scene, cam, _CFG)
    img_g = render_diff(jax.random.PRNGKey(1), scene, cam, _CFG)
    a, b = np.asarray(img_g), np.asarray(img_d)
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) < 0.5 * max(b.mean(), 1e-3)


def test_emission_gradient_positive():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    loss, grads = pixel_gradients(jax.random.PRNGKey(0), scene, cam, _CFG,
                                  lambda img: jnp.mean(img))
    g_em = np.asarray(grads.emission)
    assert np.isfinite(g_em).all()
    # brightening the lights brightens the image
    assert g_em[scene.n_surfaces:].sum() > 0.0
    # geometry is stop-gradient by design
    assert np.allclose(np.asarray(grads.v0), 0.0)


def test_reflectance_gradient_positive():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    loss, grads = pixel_gradients(jax.random.PRNGKey(0), scene, cam, _CFG,
                                  lambda img: jnp.mean(img))
    g_c = np.asarray(grads.diffuse_c)[: scene.n_surfaces]
    assert np.isfinite(g_c).all()
    assert g_c.sum() > 0.0


def test_gradient_descent_recovers_brightness():
    """A one-parameter inverse-rendering sanity check: scaling the light
    power to match a target image via the pixel gradients."""
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    target = render_diff(jax.random.PRNGKey(0), scene, cam, _CFG)

    def loss(scale):
        import dataclasses
        s2 = dataclasses.replace(scene, emission=scene.emission * scale)
        img = render_diff(jax.random.PRNGKey(0), s2, cam, _CFG)
        return jnp.mean((img - target) ** 2)

    g = jax.grad(loss)(jnp.float32(0.5))
    assert float(g) < 0.0    # too dark -> increase scale
    g = jax.grad(loss)(jnp.float32(2.0))
    assert float(g) > 0.0    # too bright -> decrease scale
