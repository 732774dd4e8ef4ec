"""CPU-engine modes kept per SURVEY §2.4: precomputed radiance maps.

* `precompute_radiance_grids` — seed every volume's Q grid by path tracing
  jittered rays per sector (ref: Old_CPU_Rendering_Engine/.../
  radiance_volume.cpp:63-100 get_radiance_estimate);
* `render_precomputed_irradiance` — single-bounce render that displays the
  interpolated irradiance estimate directly
  (ref: .../path_tracing/precompute_irradiance_path_tracing.cpp:20-53);
* `render_importance_sampled` — full path trace guided by a *frozen*
  precomputed radiance map, no learning during render
  (ref: .../path_tracing/importance_sampling_path_tracing.cpp:32-89).

Deviation (documented): the CPU engine's grid is RGB; ours is the GPU
engine's scalar Q, so the precompute stores the radiance luminance
(0.5*(max+min), material.cu:4-14) of the traced RGB estimate.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.integrators.default_tracer import trace_sample
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.radiance.interpolation import interpolated_irradiance
from rlrpt_tpu.radiance.nn_search import find_closest_volume
from rlrpt_tpu.radiance.volumes import (RadianceVolumes, rebuild_cdf,
                                        sample_from_cdf)
from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, Scene


@partial(jax.jit, static_argnames=("cfg", "spp"))
def precompute_radiance_grids(key, scene: Scene, vols: RadianceVolumes,
                              cfg: RenderConfig,
                              spp: int = 16) -> RadianceVolumes:
    """Fill every volume's Q grid by path tracing `spp` jittered rays per
    sector from the volume position (ref: radiance_volume.cpp:63-100).
    Returns volumes with Q set and the CDF rebuilt."""
    v = vols.n_volumes
    s = vols.n_sectors
    g = vols.grid_resolution

    sx, sy = hs.sector_index_to_grid(jnp.arange(s), g)

    def one_pass(i, acc):
        k = jax.random.fold_in(key, i)
        k_jit, k_trace = jax.random.split(k)
        r = jax.random.uniform(k_jit, (v, s, 2), dtype=jnp.float32)
        d = hs.grid_pos_to_direction(
            sx[None, :] + r[..., 0], sy[None, :] + r[..., 1],
            vols.frame[:, None, :, :], g)                      # (V, S, 3)
        o = vols.position[:, None, :] + cfg.eps * d
        rad, _ = trace_sample(k_trace, o.reshape(-1, 3), d.reshape(-1, 3),
                              scene, cfg)
        # Scalar grid: luminance of the RGB estimate (material.cu:4-14).
        lum = 0.5 * (jnp.max(rad, axis=-1) + jnp.min(rad, axis=-1))
        return acc + lum.reshape(v, s)

    total = jax.lax.fori_loop(0, spp, one_pass, jnp.zeros((v, s), jnp.float32))
    out = dataclasses.replace(vols, q=total / spp)
    return rebuild_cdf(out)


@partial(jax.jit, static_argnames=("cfg", "max_dist"))
def render_precomputed_irradiance(key, scene: Scene, camera: Camera,
                                  vols: RadianceVolumes, cfg: RenderConfig,
                                  max_dist: float = 0.5):
    """Primary-hit render of the interpolated irradiance estimates
    (ref: precompute_irradiance_path_tracing.cpp:20-53)."""
    o, d = primary_rays(key, camera, cfg.width, cfg.height, cfg.focal)
    hit = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
    irr = interpolated_irradiance(vols, hit.position, hit.normal,
                                  scene.diffuse_c[hit.tri], max_dist)
    col = jnp.where((hit.hit_type == SURFACE)[:, None], irr,
                    jnp.where((hit.hit_type == AREA_LIGHT)[:, None],
                              scene.emission[hit.tri], 0.0))
    return col.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg", "rl"))
def render_importance_sampled(key, scene: Scene, camera: Camera,
                              vols: RadianceVolumes, cfg: RenderConfig,
                              rl: RadianceVolumeConfig):
    """Path trace guided by a frozen radiance map — importance sampling
    from the precomputed CDFs with NO learning during the render
    (ref: importance_sampling_path_tracing.cpp:32-89).  Returns (img, aux).
    """
    n = cfg.n_pixels

    def trace_one(key, o, d):
        def cond(c):
            bounce, _, _, _, _, active, _ = c
            return (bounce < cfg.max_ray_bounces) & jnp.any(active)

        def body(c):
            bounce, key, o, d, tp, active, rad = c
            hit = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
            is_nothing = active & (hit.hit_type == NOTHING)
            is_light = active & (hit.hit_type == AREA_LIGHT)
            is_surface = active & (hit.hit_type == SURFACE)
            rad = rad + (jnp.where(is_nothing[:, None],
                                   tp * cfg.environment_light, 0.0)
                         + jnp.where(is_light[:, None],
                                     tp * scene.emission[hit.tri], 0.0))
            vol = find_closest_volume(vols, hit.position, hit.normal)
            key, sub = jax.random.split(key)
            new_d, _, pdf = sample_from_cdf(sub, vols, vol, rl.grid_rho)
            cos_theta = jnp.sum(hit.normal * new_d, axis=-1)
            brdf = scene.diffuse_c[hit.tri] / jnp.pi
            tp = jnp.where(is_surface[:, None],
                           tp * brdf * (cos_theta
                                        / jnp.maximum(pdf, 1e-12))[:, None],
                           tp)
            o = jnp.where(is_surface[:, None],
                          hit.position + cfg.eps * new_d, o)
            d = jnp.where(is_surface[:, None], new_d, d)
            return (bounce + 1, key, o, d, tp, active & is_surface, rad)

        init = (jnp.int32(0), key, o, d, jnp.ones((n, 3), jnp.float32),
                jnp.ones((n,), bool), jnp.zeros((n, 3), jnp.float32))
        return jax.lax.while_loop(cond, body, init)[-1]

    def sample_body(i, acc):
        kcam = jax.random.fold_in(jax.random.fold_in(key, i), 1)
        ktrace = jax.random.fold_in(jax.random.fold_in(key, i), 2)
        o, d = primary_rays(kcam, camera, cfg.width, cfg.height, cfg.focal)
        return acc + trace_one(ktrace, o, d)

    acc = jax.lax.fori_loop(0, cfg.samples_per_pixel, sample_body,
                            jnp.zeros((n, 3), jnp.float32))
    img = (acc / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
    return img, {}
