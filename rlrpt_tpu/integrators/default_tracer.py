"""Default (uniform-hemisphere) Monte-Carlo path tracer.

TPU-native wavefront re-design of the reference default tracer
(ref: GPU_Rendering_Engine/Source/path_tracing/default_path_tracing.cu:36-88):
the per-pixel "one CUDA thread walks its own bounce loop" becomes one jitted
program over the whole ray wavefront — SoA state pytree, masked
`lax.while_loop` over bounces with an any-active early exit, and a
`fori_loop` over samples-per-pixel.  The estimator is identical:

  hit NOTHING     -> contribute throughput * ENVIRONMENT_LIGHT
  hit AREA_LIGHT  -> contribute throughput * diffuse_p
  hit SURFACE     -> throughput *= (diffuse_c/pi) * cos_theta / RHO,
                     cos_theta = r1 of the uniform hemisphere sample
  bounce cap MAX  -> contribute 0
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import RHO, RenderConfig
from rlrpt_tpu.ops.hemisphere import sample_uniform_direction
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, Scene


class _WaveState(NamedTuple):
    bounce: jnp.ndarray       # scalar int32
    key: jnp.ndarray
    o: jnp.ndarray            # (R, 3)
    d: jnp.ndarray            # (R, 3)
    throughput: jnp.ndarray   # (R, 3)
    active: jnp.ndarray       # (R,) bool
    radiance: jnp.ndarray     # (R, 3) accumulated result of this sample
    path_len: jnp.ndarray     # (R,) int32


def trace_sample(key, o, d, scene: Scene, cfg: RenderConfig):
    """Trace one sample per pixel for the whole wavefront.

    Returns (radiance (R,3), path_len (R,))."""
    scene = scene.to_device()  # no-op under jit; guards direct (un-jitted) calls
    n = o.shape[0]

    def cond(s: _WaveState):
        return (s.bounce < cfg.max_ray_bounces) & jnp.any(s.active)

    def body(s: _WaveState):
        hit = closest_hit(s.o, s.d, scene, ray_tile=cfg.ray_tile)

        is_nothing = s.active & (hit.hit_type == NOTHING)
        is_light = s.active & (hit.hit_type == AREA_LIGHT)
        is_surface = s.active & (hit.hit_type == SURFACE)

        # Terminal contributions (ref: default_path_tracing.cu:52-62).
        contrib = (jnp.where(is_nothing[:, None],
                             s.throughput * cfg.environment_light, 0.0)
                   + jnp.where(is_light[:, None],
                               s.throughput * scene.emission[hit.tri], 0.0))
        radiance = s.radiance + contrib

        # Diffuse bounce (ref: default_path_tracing.cu:65-83).  The RR key is
        # drawn only when RR is enabled (static branch): split(key, 3) would
        # perturb the threefry stream and break bitwise parity of RR-off
        # renders with the plain renderer (ADVICE r1).
        if cfg.russian_roulette:
            key, sub, krr = jax.random.split(s.key, 3)
        else:
            key, sub = jax.random.split(s.key)
        new_d, cos_theta = sample_uniform_direction(sub, hit.normal)
        brdf = scene.diffuse_c[hit.tri] / jnp.pi
        throughput = jnp.where(
            is_surface[:, None],
            s.throughput * brdf * (cos_theta[:, None] / RHO),
            s.throughput)
        o_next = jnp.where(is_surface[:, None],
                           hit.position + cfg.eps * new_d, s.o)
        d_next = jnp.where(is_surface[:, None], new_d, s.d)

        terminated = is_nothing | is_light
        path_len = jnp.where(terminated, s.bounce + 1, s.path_len)
        active = s.active & is_surface

        # Optional unbiased Russian roulette (config.RenderConfig docstring);
        # survival weighting keeps E[radiance] identical.
        if cfg.russian_roulette:
            p = jnp.clip(jnp.max(throughput, axis=-1),
                         cfg.rr_min_prob, 1.0)
            do_rr = active & (s.bounce + 1 >= cfg.rr_start_bounce)
            killed = do_rr & (jax.random.uniform(krr, (n,)) >= p)
            throughput = jnp.where((do_rr & ~killed)[:, None],
                                   throughput / p[:, None], throughput)
            path_len = jnp.where(killed, s.bounce + 1, path_len)
            active = active & ~killed

        return _WaveState(bounce=s.bounce + 1, key=key, o=o_next, d=d_next,
                          throughput=throughput, active=active,
                          radiance=radiance, path_len=path_len)

    init = _WaveState(
        bounce=jnp.int32(0), key=key, o=o, d=d,
        throughput=jnp.ones((n, 3), jnp.float32),
        active=jnp.ones((n,), bool),
        radiance=jnp.zeros((n, 3), jnp.float32),
        # Rays that exhaust the bounce budget report MAX_RAY_BOUNCES
        # (ref: default_path_tracing.cu:86-87).
        path_len=jnp.full((n,), cfg.max_ray_bounces, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.radiance, final.path_len


@partial(jax.jit, static_argnames="cfg")
def render_default(key, scene: Scene, camera: Camera, cfg: RenderConfig):
    """Render a frame; returns (image (H, W, 3), aux dict).

    aux: avg_path_length (scalar, matches the reference's printed stat,
    main.cu:223-229).
    """
    n = cfg.n_pixels

    def sample_body(i, carry):
        acc, path_acc = carry
        kcam = jax.random.fold_in(jax.random.fold_in(key, i), 1)
        ktrace = jax.random.fold_in(jax.random.fold_in(key, i), 2)
        o, d = primary_rays(kcam, camera, cfg.width, cfg.height, cfg.focal)
        rad, plen = trace_sample(ktrace, o, d, scene, cfg)
        return acc + rad, path_acc + plen

    acc, path_acc = jax.lax.fori_loop(
        0, cfg.samples_per_pixel, sample_body,
        (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.int32)))

    img = (acc / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
    avg_path = jnp.mean(path_acc.astype(jnp.float32)) / cfg.samples_per_pixel
    return img, {"avg_path_length": avg_path}
