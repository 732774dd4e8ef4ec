"""Expected-SARSA reinforcement path tracer.

TPU-native wavefront re-design of the reference reinforcement tracer
(ref: GPU_Rendering_Engine/Source/path_tracing/reinforcement_path_tracing.cu
:50-120 and radiance_map.cu:91-146):

per bounce, for every ray simultaneously
  1. TD-update the sector chosen at the *previous* vertex with a target
     derived from what this bounce hit (env / light luminance / next
     volume's irradiance estimate, each scaled by the previous surface's
     BRDF luminance/pi) — as one deterministic segment-sum batch;
  2. importance-sample the next direction from the nearest volume's CDF,
     throughput *= (diffuse_c/pi) * cos_theta / pdf;

and once per frame the CDFs are rebuilt from the Q grid
(ref: reinforcement_path_tracing.cu:6-13).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import RHO, RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.ops.hemisphere import sample_uniform_direction
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.radiance.nn_search import find_closest_volume
from rlrpt_tpu.radiance.volumes import (RadianceVolumes, expected_sarsa_update,
                                        irradiance_estimates, rebuild_cdf,
                                        sample_from_cdf)
import jax.lax as lax
from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, Scene


class _SarsaState(NamedTuple):
    bounce: jnp.ndarray
    key: jnp.ndarray
    o: jnp.ndarray
    d: jnp.ndarray
    throughput: jnp.ndarray
    active: jnp.ndarray
    radiance: jnp.ndarray
    path_len: jnp.ndarray
    cur_vol: jnp.ndarray      # (R,) volume whose sector awaits a TD target
    cur_sector: jnp.ndarray   # (R,) int32, -1 = no pending update
    cur_brdf: jnp.ndarray     # (R,) previous surface luminance / pi
    vols: RadianceVolumes


def trace_sample_sarsa(key, o, d, scene: Scene, vols: RadianceVolumes,
                       cfg: RenderConfig, rl: RadianceVolumeConfig,
                       axis_name=None):
    """One sample per pixel with online SARSA learning.

    Returns (radiance (R,3), path_len (R,), updated volumes).

    Under shard_map (`axis_name` set) the per-bounce Q-table contributions
    are psum'd across the ray axis and the early-exit flag is made uniform
    so every device runs the same trip count (collectives inside a
    while_loop require congruent loops)."""
    scene = scene.to_device()  # no-op under jit; guards direct (un-jitted) calls
    n = o.shape[0]

    def any_active(a):
        flag = jnp.any(a)
        if axis_name is not None:
            flag = lax.psum(flag.astype(jnp.int32), axis_name) > 0
        return flag

    def cond(s: _SarsaState):
        return (s.bounce < cfg.max_ray_bounces) & any_active(s.active)

    def body(s: _SarsaState):
        hit = closest_hit(s.o, s.d, scene, ray_tile=cfg.ray_tile)

        is_nothing = s.active & (hit.hit_type == NOTHING)
        is_light = s.active & (hit.hit_type == AREA_LIGHT)
        is_surface = s.active & (hit.hit_type == SURFACE)

        # Nearest volume at the new intersection (used both as the TD target
        # source and as the sampling distribution for this vertex;
        # ref: radiance_map.cu:126-143).
        next_vol = find_closest_volume(s.vols, hit.position, hit.normal)

        # ---- 1. TD update of the previously chosen sector --------------
        # (ref: reinforcement_path_tracing.cu:69-78; targets per hit type
        #  radiance_map.cu:111-146)
        pending = s.active & (s.cur_sector >= 0)
        irr = irradiance_estimates(s.vols)  # (V,)
        target = jnp.where(
            hit.hit_type == NOTHING,
            s.cur_brdf * cfg.environment_light,
            jnp.where(hit.hit_type == AREA_LIGHT,
                      s.cur_brdf * scene.luminance[hit.tri],
                      s.cur_brdf * irr[next_vol]))
        vols_new = expected_sarsa_update(
            s.vols, s.cur_vol, jnp.maximum(s.cur_sector, 0), target, pending,
            rl.radiance_threshold, axis_name=axis_name)

        # ---- 2. terminal contributions ----------------------------------
        contrib = (jnp.where(is_nothing[:, None],
                             s.throughput * cfg.environment_light, 0.0)
                   + jnp.where(is_light[:, None],
                               s.throughput * scene.emission[hit.tri], 0.0))
        radiance = s.radiance + contrib

        # ---- 3. importance-sample the next direction ---------------------
        # RR key drawn only when enabled (static branch) so RR-off renders
        # keep the pre-RR threefry stream bitwise (ADVICE r1).
        if cfg.russian_roulette:
            key, sub, krr = jax.random.split(s.key, 3)
        else:
            key, sub = jax.random.split(s.key)
        new_d, sector, pdf = sample_from_cdf(sub, vols_new, next_vol,
                                             rl.grid_rho)
        cos_theta = jnp.sum(hit.normal * new_d, axis=-1)
        brdf = scene.diffuse_c[hit.tri] / jnp.pi
        pdf_safe = jnp.maximum(pdf, 1e-12)
        throughput = jnp.where(
            is_surface[:, None],
            s.throughput * brdf * (cos_theta / pdf_safe)[:, None],
            s.throughput)
        o_next = jnp.where(is_surface[:, None],
                           hit.position + cfg.eps * new_d, s.o)
        d_next = jnp.where(is_surface[:, None], new_d, s.d)

        terminated = is_nothing | is_light
        path_len = jnp.where(terminated, s.bounce + 1, s.path_len)
        active = s.active & is_surface

        # Optional unbiased Russian roulette (config.RenderConfig docstring);
        # the RL-guided sampling concentrates throughput, so deep tails are
        # rare and cheap to cut.
        if cfg.russian_roulette:
            p = jnp.clip(jnp.max(throughput, axis=-1), cfg.rr_min_prob, 1.0)
            do_rr = active & (s.bounce + 1 >= cfg.rr_start_bounce)
            killed = do_rr & (jax.random.uniform(krr, (n,)) >= p)
            throughput = jnp.where((do_rr & ~killed)[:, None],
                                   throughput / p[:, None], throughput)
            path_len = jnp.where(killed, s.bounce + 1, path_len)
            active = active & ~killed

        # Pending TD state for the next bounce: the sector just sampled,
        # BRDF = this surface's luminance/pi
        # (ref: reinforcement_path_tracing.cu:104-110).
        cur_vol = jnp.where(is_surface, next_vol, s.cur_vol)
        cur_sector = jnp.where(is_surface, sector, -1)
        cur_brdf = jnp.where(is_surface, scene.luminance[hit.tri] / jnp.pi,
                             s.cur_brdf)

        return _SarsaState(bounce=s.bounce + 1, key=key, o=o_next, d=d_next,
                           throughput=throughput, active=active,
                           radiance=radiance, path_len=path_len,
                           cur_vol=cur_vol, cur_sector=cur_sector,
                           cur_brdf=cur_brdf, vols=vols_new)

    init = _SarsaState(
        bounce=jnp.int32(0), key=key, o=o, d=d,
        throughput=jnp.ones((n, 3), jnp.float32),
        active=jnp.ones((n,), bool),
        radiance=jnp.zeros((n, 3), jnp.float32),
        path_len=jnp.full((n,), cfg.max_ray_bounces, jnp.int32),
        cur_vol=jnp.zeros((n,), jnp.int32),
        cur_sector=jnp.full((n,), -1, jnp.int32),
        cur_brdf=jnp.zeros((n,), jnp.float32),
        vols=vols,
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.radiance, final.path_len, final.vols


@partial(jax.jit, static_argnames=("cfg", "rl"))
def render_frame_sarsa(key, scene: Scene, camera: Camera,
                       vols: RadianceVolumes, cfg: RenderConfig,
                       rl: RadianceVolumeConfig):
    """Render one frame while learning; returns (image, volumes, aux).

    aux matches the reference's per-frame stats line (main.cu:322-339):
    avg_path_length and zero_contribution_light_paths (samples whose mean
    RGB falls below THROUGHPUT_THRESHOLD, reinforcement_path_tracing.cu:
    38-42).  The CDF rebuild runs once per frame at the end
    (ref: main.cu:342-344).
    """
    n = cfg.n_pixels

    def sample_body(i, carry):
        acc, path_acc, zclp, vols_c = carry
        kcam = jax.random.fold_in(jax.random.fold_in(key, i), 1)
        ktrace = jax.random.fold_in(jax.random.fold_in(key, i), 2)
        o, d = primary_rays(kcam, camera, cfg.width, cfg.height, cfg.focal)
        rad, plen, vols_c = trace_sample_sarsa(ktrace, o, d, scene, vols_c,
                                               cfg, rl)
        zero = jnp.mean(rad, axis=-1) < cfg.throughput_threshold
        return (acc + rad, path_acc + plen, zclp + jnp.sum(zero), vols_c)

    acc, path_acc, zclp, vols = jax.lax.fori_loop(
        0, cfg.samples_per_pixel, sample_body,
        (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.int32),
         jnp.int32(0), vols))

    vols = rebuild_cdf(vols, rl.distribution_threshold,
                       rl.defensive_mix)
    img = (acc / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
    aux = {
        "avg_path_length": jnp.mean(path_acc.astype(jnp.float32))
        / cfg.samples_per_pixel,
        "zero_contribution_light_paths": zclp,
    }
    return img, vols, aux
