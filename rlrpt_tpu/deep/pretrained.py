"""Inference-only neural-Q path tracer (mode 4).

TPU-native re-design of the reference PretrainedPathtracer
(ref: GPU_Rendering_Engine/Source/deep_learning/pre_trained_pathtracer.cu):
the same wavefront skeleton as the training tracer but with a frozen
network, pure importance sampling over Q*cos (no epsilon-greedy, no TD
updates, no learning-only respawns — :286 uses
sample_batch_ray_directions_importance_sample), and a simplified trace
(:413-491) that skips rays already terminated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig, DeepLearningConfig
from rlrpt_tpu.deep.neural_q import (ACTIVE, NeuralQState, _q_forward,
                                     init_rays, sample_directions)
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, Scene


class _Carry(NamedTuple):
    state: NeuralQState
    key: jnp.ndarray
    bounce: jnp.ndarray
    go: jnp.ndarray


def _trace_sample_pretrained(key, scene, camera, params, cfg: RenderConfig,
                             rl: RadianceVolumeConfig, dl: DeepLearningConfig,
                             hit_fn=None):
    if hit_fn is None:
        from rlrpt_tpu.ops.intersect_pallas import material_rows

        def hit_fn(o, d):
            h = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
            return h, material_rows(scene, h.tri)
    k_init, k_loop = jax.random.split(key)
    state0 = init_rays(k_init, camera, cfg)

    def cond(c: _Carry):
        return c.go & (c.bounce < cfg.max_ray_bounces)

    def body(c: _Carry):
        key, k_dir = jax.random.split(c.key)
        state = c.state
        active = state.states == ACTIVE

        def sample_branch(state):
            qs = _q_forward(params, scene, state.loc, dl)
            # epsilon = 0 -> pure importance sampling
            # (ref: pre_trained_pathtracer.cu:286).
            d, a, factor = sample_directions(k_dir, qs, state, 0.0,
                                             rl.grid_resolution, rl.grid_rho)
            tp = jnp.where(active[:, None],
                           state.throughput * factor[:, None],
                           state.throughput)
            return state._replace(direction=d, action=a, throughput=tp)

        state = jax.lax.cond(c.bounce > 0, sample_branch, lambda s: s, state)

        # Simplified trace: terminated rays are left untouched
        # (ref: pre_trained_pathtracer.cu:432-435).
        hit, mat = hit_fn(state.loc + cfg.eps * state.direction,
                          state.direction)
        is_nothing = active & (hit.hit_type == NOTHING)
        is_light = active & (hit.hit_type == AREA_LIGHT)
        is_surface = active & (hit.hit_type == SURFACE)

        tp_mult = jnp.where(
            is_nothing[:, None], cfg.environment_light,
            jnp.where(is_light[:, None], mat[:, 6:9],
                      jnp.where(is_surface[:, None],
                                mat[:, 3:6] / jnp.pi, 1.0)))
        throughput = state.throughput * tp_mult
        terminated = is_nothing | is_light
        states = jnp.where(terminated, 1, state.states)
        bounces = jnp.where(terminated, c.bounce, state.bounces)
        loc = jnp.where(is_surface[:, None], hit.position, state.loc)
        normal = jnp.where(is_surface[:, None], hit.normal, state.normal)

        state = state._replace(loc=loc, normal=normal, states=states,
                               throughput=throughput, bounces=bounces)
        return _Carry(state=state, key=key, bounce=c.bounce + 1,
                      go=jnp.any(is_surface))

    final = jax.lax.while_loop(
        cond, body, _Carry(state=state0, key=k_loop, bounce=jnp.int32(0),
                           go=jnp.bool_(True)))
    return final.state


def render_frame_pretrained(key, scene: Scene, camera: Camera, params,
                            cfg: RenderConfig, rl: RadianceVolumeConfig,
                            dl: DeepLearningConfig, use_pallas: bool = True,
                            interpret: bool | None = None):
    """Render one frame with a frozen network; returns (image, aux).

    The closest-hit sweep runs in the Pallas VMEM kernel by default
    (interpret mode auto-selected on the CPU backend); use_pallas=False
    falls back to the XLA sweep."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _render_frame_pretrained(key, scene, camera, params, cfg, rl, dl,
                                    use_pallas, interpret)


@partial(jax.jit, static_argnames=("cfg", "rl", "dl", "use_pallas",
                                   "interpret"))
def _render_frame_pretrained(key, scene: Scene, camera: Camera, params,
                             cfg: RenderConfig, rl: RadianceVolumeConfig,
                             dl: DeepLearningConfig, use_pallas: bool,
                             interpret: bool):
    from rlrpt_tpu.deep.neural_q import _make_hit_fn
    n = cfg.n_pixels
    spp = cfg.samples_per_pixel
    hit_fn = _make_hit_fn(scene, cfg, use_pallas, interpret)

    def sample_body(i, carry):
        total_tp, path_acc, key = carry
        key, k_s = jax.random.split(key)
        state = _trace_sample_pretrained(k_s, scene, camera, params, cfg, rl,
                                         dl, hit_fn=hit_fn)
        return (total_tp + state.throughput,
                path_acc + state.bounces, key)

    total_tp, path_acc, _ = jax.lax.fori_loop(
        0, spp, sample_body,
        (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.int32), key))

    img = (total_tp / spp).reshape(cfg.height, cfg.width, 3)
    aux = {"avg_path_length":
           jnp.mean(path_acc.astype(jnp.float32)) / spp}
    return img, aux
