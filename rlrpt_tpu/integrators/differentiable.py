"""Differentiable rendering path — end-to-end pixel gradients.

The production tracers use `lax.while_loop` (early exit), which has no
reverse-mode derivative; this variant runs the same estimator over a fixed
`lax.scan` of `max_ray_bounces` steps so `jax.grad` flows from pixels back
to the scene's continuous parameters (reflectance `diffuse_c`, emission,
environment light) — the BASELINE north star's pixel-gradient requirement.

Discrete/discontinuous quantities follow SURVEY §7's prescription:
hit indices, hit positions and sampled directions are wrapped in
`stop_gradient` (geometry edges are measure-zero discontinuities; direction
sampling matches Q-learning's stop-gradient semantics), so gradients are
exact for shading/material parameters at fixed path geometry — the same
regime score-function/detached-sampling differentiable renderers target.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import RHO, RenderConfig
from rlrpt_tpu.ops.hemisphere import sample_uniform_direction
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, Scene


def trace_sample_diff(key, o, d, scene: Scene, cfg: RenderConfig):
    """One differentiable sample per pixel; returns radiance (R, 3)."""
    n = o.shape[0]
    sg = jax.lax.stop_gradient

    def body(carry, bounce):
        key, o, d, tp, active, radiance = carry
        hit = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
        tri = sg(hit.tri)
        is_nothing = active & (hit.hit_type == NOTHING)
        is_light = active & (hit.hit_type == AREA_LIGHT)
        is_surface = active & (hit.hit_type == SURFACE)

        contrib = (jnp.where(is_nothing[:, None],
                             tp * cfg.environment_light, 0.0)
                   + jnp.where(is_light[:, None], tp * scene.emission[tri],
                               0.0))
        radiance = radiance + contrib

        key, sub = jax.random.split(key)
        new_d, cos_theta = sample_uniform_direction(sub, sg(hit.normal))
        new_d, cos_theta = sg(new_d), sg(cos_theta)
        brdf = scene.diffuse_c[tri] / jnp.pi
        tp = jnp.where(is_surface[:, None],
                       tp * brdf * (cos_theta[:, None] / RHO), tp)
        o = jnp.where(is_surface[:, None],
                      sg(hit.position) + cfg.eps * new_d, o)
        d = jnp.where(is_surface[:, None], new_d, d)
        active = active & is_surface
        return (key, o, d, tp, active, radiance), None

    init = (key, o, d, jnp.ones((n, 3), jnp.float32),
            jnp.ones((n,), bool), jnp.zeros((n, 3), jnp.float32))
    (_, _, _, _, _, radiance), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.max_ray_bounces))
    return radiance


@partial(jax.jit, static_argnames="cfg")
def render_diff(key, scene: Scene, camera: Camera, cfg: RenderConfig):
    """Differentiable frame render; returns image (H, W, 3).

    `jax.grad` of any scalar of the output w.r.t. scene.diffuse_c /
    scene.emission / cfg-independent parameters is well-defined.
    """
    n = cfg.n_pixels

    def sample_body(carry, i):
        acc, key = carry
        key, kcam, ktr = jax.random.split(key, 3)
        o, d = primary_rays(kcam, camera, cfg.width, cfg.height, cfg.focal)
        rad = trace_sample_diff(ktr, o, d, scene, cfg)
        return (acc + rad, key), None

    (acc, _), _ = jax.lax.scan(sample_body,
                               (jnp.zeros((n, 3), jnp.float32), key),
                               jnp.arange(cfg.samples_per_pixel))
    return (acc / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)


def pixel_gradients(key, scene: Scene, camera: Camera, cfg: RenderConfig,
                    loss_fn):
    """Gradients of `loss_fn(image)` w.r.t. the scene's continuous
    parameters.  Returns (loss, grads) where grads is a Scene-shaped pytree
    (zeros for geometry fields, which are stop-gradient by design)."""

    def f(scene):
        return loss_fn(render_diff(key, scene, camera, cfg))

    return jax.value_and_grad(f)(scene)
