"""Neural-Q path tracer with online TD training.

TPU-native wavefront re-design of the reference NeuralQPathtracer
(ref: GPU_Rendering_Engine/Source/deep_learning/neural_q_pathtracer.cu and
nn_rendering_helpers.cu).  The reference advances all H*W rays one bounce at
a time, but evaluates/trains its DyNet MLP on the host in 4096-ray batches —
~6 host<->device transfers per batch per bounce, measured >100x slowdown
(thesis 4_critical_evaluation.tex:283-285).  Here the entire frame — forward
passes, epsilon-greedy sampling, tracing, TD targets, and the sequential
per-minibatch Adam updates — is ONE jitted program; no transfers exist.

Algorithm fidelity notes (all cited to the reference):

* ray state machine: 0 = active (contributes to the image), 1 = terminated
  this bounce, 2 = learning-only; terminated rays respawn at random scene
  surface points as learning-only (neural_q_pathtracer.cu:519-525,
  nn_rendering_helpers.cu:241-277);
* rewards/discounts per hit (trace_ray, neural_q_pathtracer.cu:646-752):
  NOTHING -> r=0, gamma=0; AREA_LIGHT -> r=luminance*200 (:697), gamma=0;
  SURFACE -> r=0, gamma=surface luminance; throughput updates are gated on
  state==0 (BRDF/pi at surface hits, emission at terminations);
* direction choice (nn_rendering_helpers.cu:300-489): with prob epsilon a
  uniform random sector (throughput *= cos/RHO), else importance sampling
  over Q*cos(theta) with pdf = RHO * (p_a / GRID_RHO);
* TD target (nn_rendering_helpers.cu:91-140): r + gamma * max_a Q(s',a)*cos_a
  for non-terminated rays, r for terminated.  The reference seeds its max
  scan with Q(s',0) UNWEIGHTED by cos (a faithful quirk we reproduce:
  target max = max(Q_0, max_{a>=1} Q_a cos_a));
* training (neural_q_pathtracer.cu:421-513): per 4096-ray minibatch,
  loss = sum((td - Q(s,a))^2), one Adam update per minibatch *sequentially*
  (the reference rebuilds its graph per batch after the previous update —
  reproduced with a lax.scan over minibatches);
* epsilon decays by EPSILON_DECAY per spp-sample, floored at EPSILON_MIN
  (neural_q_pathtracer.cu:544).

Deliberate deviations (documented, statistically equivalent or bug fixes):

* the relative-vertex encoding is never materialised — the first layer is
  affine in it, so Q(verts - tile(p)) collapses to a 3-input affine form
  with identical parameters and gradients (see nn.dq_network.
  dq_apply_relative);  the reference stores a (H*W, 3T) buffer (~700 MB);
* the reference's respawn kernel writes pos.y into the z slot and pos.z
  into the y slot (nn_rendering_helpers.cu:267-269 — index bug); we write
  coordinates in order;
* importance weights use the constant sector-centre cos table rather than
  re-jittered per-action directions (the reference re-samples a random
  in-sector direction per action just to compute cos, nn_rendering_helpers
  .cu:415-436);
* an all-zero Q row (possible under the ReLU output layer) would divide by
  zero in the reference; we fall back to a uniform distribution.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import RHO, DeepLearningConfig, RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.nn.dq_network import DQNetworkParams, dq_apply, dq_apply_relative, dq_init
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.ops.linalg import make_frame
from rlrpt_tpu.scene.scene import AREA_LIGHT, NOTHING, SURFACE, Scene

ACTIVE, TERMINATED, LEARNING_ONLY = 0, 1, 2


class NeuralQState(NamedTuple):
    """SoA wavefront ray state (ref: neural_q_pathtracer.cu:76-96)."""

    loc: jnp.ndarray         # (R, 3) current state position
    prev_loc: jnp.ndarray    # (R, 3) position where the last action was taken
    normal: jnp.ndarray      # (R, 3)
    direction: jnp.ndarray   # (R, 3)
    states: jnp.ndarray      # (R,) int32: 0 active / 1 terminated / 2 learning
    rewards: jnp.ndarray     # (R,)
    discounts: jnp.ndarray   # (R,)
    throughput: jnp.ndarray  # (R, 3)
    bounces: jnp.ndarray     # (R,) int32
    action: jnp.ndarray      # (R,) int32 sector chosen at prev_loc


def init_rays(key, camera: Camera, cfg: RenderConfig) -> NeuralQState:
    """initialise_ray (ref: neural_q_pathtracer.cu:603-643)."""
    o, d = primary_rays(key, camera, cfg.width, cfg.height, cfg.focal)
    return init_rays_from(o, d, cfg)


def init_rays_from(o, d, cfg: RenderConfig) -> NeuralQState:
    n = o.shape[0]
    return NeuralQState(
        loc=o, prev_loc=o, normal=jnp.zeros_like(o), direction=d,
        states=jnp.zeros((n,), jnp.int32),
        rewards=jnp.zeros((n,), jnp.float32),
        discounts=jnp.ones((n,), jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        bounces=jnp.full((n,), cfg.max_ray_bounces, jnp.int32),
        action=jnp.zeros((n,), jnp.int32),
    )


def _q_forward(params, scene: Scene, loc, dl: DeepLearningConfig):
    if dl.train_on_position:
        return dq_apply(params, loc)
    return dq_apply_relative(params, scene.vertices_flat, loc)


def sample_directions(key, qs, state: NeuralQState, epsilon,
                      grid_resolution: int, grid_rho: float):
    """Epsilon-greedy / importance direction sampling for every ray.

    ref: nn_rendering_helpers.cu:331-489.  Returns (direction, action,
    throughput_factor) — factor = cos/pdf, applied by the caller when
    state==0.
    """
    s = grid_resolution * grid_resolution
    cos = hs.sector_cos_thetas(grid_resolution)                  # (S,)
    k_eps, k_r, k_rand, k_jit = jax.random.split(key, 4)

    # Importance branch: normalised Q*cos distribution + inverse-CDF sample.
    w = qs * cos[None, :]
    total = jnp.sum(w, axis=-1, keepdims=True)
    uniform = jnp.full_like(w, 1.0 / s)
    q_dist = jnp.where(total > 0.0, w / jnp.where(total == 0, 1.0, total),
                       uniform)
    cdf = jnp.cumsum(q_dist, axis=-1)
    r = jax.random.uniform(k_r, (qs.shape[0], 1), dtype=jnp.float32)
    sector_imp = jnp.minimum(jnp.sum(cdf <= r, axis=-1), s - 1).astype(jnp.int32)
    # One-hot select, not take_along_axis (latency-bound gather on TPU —
    # see volumes.sample_from_cdf_rows).
    iota = jax.lax.broadcasted_iota(jnp.int32, q_dist.shape, 1)
    p_imp = jnp.sum(jnp.where(iota == sector_imp[:, None], q_dist, 0.0),
                    axis=-1)
    pdf_imp = RHO * (p_imp / grid_rho)

    # Explore branch: uniform random sector, pdf treated as the uniform-
    # hemisphere RHO (ref: nn_rendering_helpers.cu:33-36,369-389).
    u = jax.random.uniform(k_rand, (qs.shape[0],), dtype=jnp.float32)
    sector_rand = jnp.clip(((u - 1e-4) * s).astype(jnp.int32), 0, s - 1)
    pdf_rand = jnp.full_like(pdf_imp, RHO)

    explore = jax.random.uniform(k_eps, (qs.shape[0],)) <= epsilon
    sector = jnp.where(explore, sector_rand, sector_imp)
    pdf = jnp.where(explore, pdf_rand, pdf_imp)

    frame = make_frame(state.normal)
    direction = hs.sample_sector_direction(k_jit, sector, frame,
                                           grid_resolution)
    cos_theta = jnp.sum(state.normal * direction, axis=-1)
    factor = cos_theta / jnp.maximum(pdf, 1e-12)
    return direction, sector, factor


def trace_step(state: NeuralQState, scene: Scene, bounce,
               cfg: RenderConfig, dl: DeepLearningConfig, hit_fn=None):
    """trace_ray for the whole wavefront (ref: neural_q_pathtracer.cu:646-752).

    `hit_fn(o, d) -> (Hit, mat)` overrides the closest-hit implementation
    (the frame renderers pass the MXU material-row kernel, the same fast
    path the SARSA wavefront uses; default is the XLA sweep + gathered
    material rows).  Returns (new_state, any_active_surface_hit)."""
    if hit_fn is None:
        from rlrpt_tpu.ops.intersect_pallas import material_rows

        def hit_fn(o, d):
            h = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
            return h, material_rows(scene, h.tri)
    hit, mat = hit_fn(state.loc + cfg.eps * state.direction,
                      state.direction)
    is_nothing = hit.hit_type == NOTHING
    is_light = hit.hit_type == AREA_LIGHT
    is_surface = hit.hit_type == SURFACE
    active = state.states == ACTIVE

    lum = mat[:, 10]
    rewards = jnp.where(is_light, lum * dl.light_reward_scale, 0.0)
    discounts = jnp.where(is_surface, lum, 0.0)

    tp_mult = jnp.where(
        is_nothing[:, None], cfg.environment_light,
        jnp.where(is_light[:, None], mat[:, 6:9],
                  mat[:, 3:6] / jnp.pi))
    throughput = jnp.where(active[:, None], state.throughput * tp_mult,
                           state.throughput)

    terminated = is_nothing | is_light
    bounces = jnp.where(active & terminated, bounce, state.bounces)
    states = jnp.where(terminated, TERMINATED, state.states)

    # The training input is the pre-trace location for every ray (the
    # reference snapshots the whole encoding buffer, neural_q_pathtracer
    # .cu:407-409).
    prev_loc = state.loc
    loc = jnp.where(is_surface[:, None], hit.position, state.loc)
    normal = jnp.where(is_surface[:, None], hit.normal, state.normal)

    new_state = state._replace(
        loc=loc, prev_loc=prev_loc, normal=normal, rewards=rewards,
        discounts=discounts, throughput=throughput, bounces=bounces,
        states=states)
    any_active_surface = jnp.any(active & is_surface)
    return new_state, any_active_surface


def compute_td_targets(params, scene: Scene, state: NeuralQState,
                       grid_resolution: int, dl: DeepLearningConfig):
    """ref: nn_rendering_helpers.cu:91-140.  Q(s',0) enters the max
    unweighted by cos — the reference's scan-seed quirk, reproduced."""
    qs_next = _q_forward(params, scene, state.loc, dl)           # (R, S)
    cos = hs.sector_cos_thetas(grid_resolution)
    weighted = jnp.max(qs_next[:, 1:] * cos[None, 1:], axis=-1)
    max_q = jnp.maximum(qs_next[:, 0], weighted)
    td = jnp.where(state.states != TERMINATED,
                   state.rewards + state.discounts * max_q, state.rewards)
    return jax.lax.stop_gradient(td)


def train_on_batches(params, opt_state, optimizer, scene: Scene,
                     prev_loc, actions, tds, dl: DeepLearningConfig,
                     axis_name=None, weights=None):
    """Sequential per-minibatch Adam updates within one bounce
    (ref: neural_q_pathtracer.cu:421-513: one graph + trainer.update() per
    4096-ray batch).  Returns (params, opt_state, summed loss).

    `weights` (R,) f32 optionally masks/weights per-ray squared errors
    (the regenerative wavefront passes its pending-transition mask).

    Under shard_map (`axis_name` set) each device holds 1/D of every global
    minibatch; gradients are psum'd over the ray axis before the (identical,
    replicated) Adam update — the effective update equals the reference's
    full-minibatch update."""
    r = prev_loc.shape[0]
    b = min(dl.batch_size, r)
    pad = (-r) % b
    w = jnp.ones((r,), jnp.float32) if weights is None else weights
    mask = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
    loc_p = jnp.concatenate([prev_loc, jnp.zeros((pad, 3), prev_loc.dtype)])
    act_p = jnp.concatenate([actions, jnp.zeros((pad,), actions.dtype)])
    td_p = jnp.concatenate([tds, jnp.zeros((pad,), tds.dtype)])
    nb = (r + pad) // b

    chunks = (loc_p.reshape(nb, b, 3), act_p.reshape(nb, b),
              td_p.reshape(nb, b), mask.reshape(nb, b))

    def step(carry, chunk):
        p, o = carry
        c_loc, c_act, c_td, c_mask = chunk

        def loss_fn(pp):
            q = _q_forward(pp, scene, c_loc, dl)
            # One-hot select (== pick(action)); take_along_axis is a
            # latency-bound gather on TPU and this runs once per
            # minibatch per bounce.
            iota = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
            qa = jnp.sum(jnp.where(iota == c_act[:, None], q, 0.0),
                         axis=-1)
            return jnp.sum(c_mask * (c_td - qa) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        n_live = jnp.sum(c_mask)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            loss = jax.lax.psum(loss, axis_name)
            n_live = jax.lax.psum(n_live, axis_name)
        # A minibatch whose rays are ALL masked out (pure padding, or no
        # pending transitions in a wavefront chunk) must not advance Adam:
        # the reference never constructs such a batch, and a zero-grad
        # Adam step still moves params through the decayed momentum.
        has_any = n_live > 0
        updates, o_new = optimizer.update(grads, o, p)
        p_new = optax.apply_updates(p, updates)
        p = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_any, a, b), p_new, p)
        o = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_any, a, b), o_new, o)
        return (p, o), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                               chunks)
    return params, opt_state, jnp.sum(losses)


def respawn_terminated(key, state: NeuralQState, scene: Scene) -> NeuralQState:
    """Respawn state-1 rays at random surface points as learning-only rays
    (ref: nn_rendering_helpers.cu:241-277; the closed-form u+v>1 fold
    replaces the reference's rejection loop, same distribution)."""
    n = state.loc.shape[0]
    k1, k2 = jax.random.split(key)
    tri = jax.random.randint(k1, (n,), 0, scene.n_surfaces)
    uv = jax.random.uniform(k2, (n, 2), dtype=jnp.float32)
    flip = uv.sum(-1) > 1.0
    uv = jnp.where(flip[:, None], 1.0 - uv, uv)
    pos = (scene.v0[tri] + uv[:, 0:1] * (scene.v1[tri] - scene.v0[tri])
           + uv[:, 1:2] * (scene.v2[tri] - scene.v0[tri]))
    nrm = scene.normal[tri]
    dead = state.states == TERMINATED
    return state._replace(
        loc=jnp.where(dead[:, None], pos, state.loc),
        normal=jnp.where(dead[:, None], nrm, state.normal),
        states=jnp.where(dead, LEARNING_ONLY, state.states))


class _BounceCarry(NamedTuple):
    state: NeuralQState
    params: DQNetworkParams
    opt_state: tuple
    key: jnp.ndarray
    bounce: jnp.ndarray
    loss: jnp.ndarray
    go: jnp.ndarray


def _make_hit_fn(scene: Scene, cfg: RenderConfig, use_pallas: bool,
                 interpret: bool):
    """Closest-hit implementation for a frame: the Pallas VMEM kernel
    (packing the triangle table once) or the XLA fallback."""
    if not use_pallas:
        from rlrpt_tpu.ops.intersect_pallas import material_rows

        def fn(o, d):
            h = closest_hit(o, d, scene, ray_tile=cfg.ray_tile)
            return h, material_rows(scene, h.tri)
        return fn
    from rlrpt_tpu.ops.intersect_pallas import (closest_hit_pallas_mat,
                                                pack_scene_mxu)
    g48, m2 = pack_scene_mxu(scene)
    return lambda o, d: closest_hit_pallas_mat(o, d, scene, g48, m2,
                                               interpret=interpret)


def _trace_sample(key, scene, camera, params, opt_state, optimizer, epsilon,
                  cfg: RenderConfig, rl: RadianceVolumeConfig,
                  dl: DeepLearningConfig, axis_name=None, rays=None,
                  hit_fn=None):
    """One spp sample: bounce loop with online training.

    Returns (final ray state, params, opt_state, summed loss).
    `rays`: optional pre-generated (origins, dirs) overriding the camera
    (used by the sharded path, which feeds each device its ray shard)."""
    k_init, k_loop = jax.random.split(key)
    if rays is None:
        state0 = init_rays(k_init, camera, cfg)
    else:
        state0 = init_rays_from(rays[0], rays[1], cfg)

    def cond(c: _BounceCarry):
        return c.go & (c.bounce < cfg.max_ray_bounces)

    def body(c: _BounceCarry):
        key, k_dir, k_spawn = jax.random.split(c.key, 3)
        state = c.state

        # -- 1. direction sampling (not at bounce 0: primary rays).
        def sample_branch(state):
            qs = _q_forward(c.params, scene, state.loc, dl)
            d, a, factor = sample_directions(k_dir, qs, state, epsilon,
                                             rl.grid_resolution, rl.grid_rho)
            tp = jnp.where((state.states == ACTIVE)[:, None],
                           state.throughput * factor[:, None],
                           state.throughput)
            return state._replace(direction=d, action=a, throughput=tp)

        state = jax.lax.cond(c.bounce > 0, sample_branch, lambda s: s, state)

        # -- 2. trace.
        state, any_active_surface = trace_step(state, scene, c.bounce, cfg,
                                               dl, hit_fn=hit_fn)
        if axis_name is not None:
            any_active_surface = jax.lax.psum(
                any_active_surface.astype(jnp.int32), axis_name) > 0

        # -- 3. TD train (not at bounce 0).
        def train_branch(args):
            params, opt_state, state = args
            td = compute_td_targets(params, scene, state, rl.grid_resolution,
                                    dl)
            return train_on_batches(params, opt_state, optimizer, scene,
                                    state.prev_loc, state.action, td, dl,
                                    axis_name=axis_name)

        params, opt_state, loss = jax.lax.cond(
            c.bounce > 0, train_branch,
            lambda args: (args[0], args[1], jnp.float32(0.0)),
            (c.params, c.opt_state, state))

        # -- 4. respawn terminated rays as learning-only.
        state = respawn_terminated(k_spawn, state, scene)

        return _BounceCarry(state=state, params=params, opt_state=opt_state,
                            key=key, bounce=c.bounce + 1,
                            loss=c.loss + loss, go=any_active_surface)

    init = _BounceCarry(state=state0, params=params, opt_state=opt_state,
                        key=k_loop, bounce=jnp.int32(0),
                        loss=jnp.float32(0.0), go=jnp.bool_(True))
    final = jax.lax.while_loop(cond, body, init)
    return final.state, final.params, final.opt_state, final.loss


def render_frame_neural_q(key, scene: Scene, camera: Camera,
                          params: DQNetworkParams, opt_state, epsilon,
                          cfg: RenderConfig, rl: RadianceVolumeConfig,
                          dl: DeepLearningConfig, use_pallas: bool = True,
                          interpret: bool | None = None):
    """Render one frame with online neural-Q training.

    Returns (image (H,W,3), params, opt_state, epsilon, aux) where aux holds
    per-sample stats arrays matching the reference's nn_training_stats.txt
    lines `avg_path_length loss zero_contribution_paths`
    (ref: neural_q_pathtracer.cu:577-583).

    The closest-hit sweep runs in the Pallas VMEM kernel by default
    (interpret mode auto-selected on the CPU backend); use_pallas=False
    falls back to the XLA sweep.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _render_frame_neural_q(key, scene, camera, params, opt_state,
                                  epsilon, cfg, rl, dl, use_pallas,
                                  interpret)


@partial(jax.jit, static_argnames=("cfg", "rl", "dl", "use_pallas",
                                   "interpret"))
def _render_frame_neural_q(key, scene: Scene, camera: Camera,
                           params: DQNetworkParams, opt_state, epsilon,
                           cfg: RenderConfig, rl: RadianceVolumeConfig,
                           dl: DeepLearningConfig, use_pallas: bool,
                           interpret: bool):
    # Rebuilt from the static config at trace time — pure functions, no state.
    optimizer = default_optimizer(dl)
    n = cfg.n_pixels
    spp = cfg.samples_per_pixel
    hit_fn = _make_hit_fn(scene, cfg, use_pallas, interpret)

    def sample_body(i, carry):
        total_tp, params, opt_state, epsilon, key, stats = carry
        key, k_s = jax.random.split(key)
        state, params, opt_state, loss = _trace_sample(
            k_s, scene, camera, params, opt_state, optimizer, epsilon,
            cfg, rl, dl, hit_fn=hit_fn)
        total_tp = total_tp + state.throughput
        avg_len = jnp.mean(state.bounces.astype(jnp.float32))
        zclp = jnp.sum(jnp.all(state.throughput < cfg.throughput_threshold,
                               axis=-1))
        stats = (stats[0].at[i].set(avg_len), stats[1].at[i].set(loss),
                 stats[2].at[i].set(zclp))
        epsilon = jnp.maximum(epsilon - dl.epsilon_decay, dl.epsilon_min)
        return total_tp, params, opt_state, epsilon, key, stats

    stats0 = (jnp.zeros((spp,), jnp.float32), jnp.zeros((spp,), jnp.float32),
              jnp.zeros((spp,), jnp.int32))
    total_tp, params, opt_state, epsilon, _, stats = jax.lax.fori_loop(
        0, spp, sample_body,
        (jnp.zeros((n, 3), jnp.float32), params, opt_state,
         jnp.asarray(epsilon, jnp.float32), key, stats0))

    img = (total_tp / spp).reshape(cfg.height, cfg.width, 3)
    aux = {"avg_path_length": stats[0], "loss": stats[1],
           "zero_contribution_light_paths": stats[2]}
    return img, params, opt_state, epsilon, aux


def default_optimizer(dl: DeepLearningConfig):
    """DyNet AdamTrainer equivalent (ref: neural_q_pathtracer.cu:47)."""
    return optax.adam(dl.learning_rate, b1=dl.adam_b1, b2=dl.adam_b2,
                      eps=dl.adam_eps)


def init_neural_q(key, scene: Scene, dl: DeepLearningConfig,
                  grid_resolution: int = 12):
    """Initialise network params + optimiser state for a scene.

    Input dim is 3 for TRAIN_ON_POSITION else 3 * 3 * n_triangles
    (ref: neural_q_pathtracer.cu:49, dq_network.cu:8-17).
    """
    input_dim = 3 if dl.train_on_position else int(scene.vertices_flat.shape[0])
    n_actions = grid_resolution * grid_resolution
    params = dq_init(key, input_dim, n_actions, dl.hidden_sizes)
    opt_state = default_optimizer(dl).init(params)
    return params, opt_state
