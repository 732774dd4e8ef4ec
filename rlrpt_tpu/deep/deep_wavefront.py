"""Persistent-wavefront neural-Q tracers (the fast deep paths).

Same estimator and learning rule as deep.pretrained / deep.neural_q (ref:
GPU_Rendering_Engine/Source/deep_learning/pre_trained_pathtracer.cu and
neural_q_pathtracer.cu), re-organised for TPU throughput exactly the way
integrators.sarsa_wavefront re-organises the SARSA tracer:

* sample regeneration + pixel multiplexing: a slot owns pix_mux pixels and
  starts the next sample / next pixel the moment a sample dies, so the
  per-iteration O(W) work — the closest-hit MXU sweep AND the MLP forward —
  is spent on ~live rays instead of a lockstep wavefront's dying tail (the
  lockstep deep frame runs its full-width MLP forward every bounce up to
  the 80-bounce cap; measured 4.0M rays/s pretrained vs the default
  wavefront's 38.4M with the same hit kernel, NEURAL_Q_BENCH r3);
* cascaded drain: once the live count fits in a 4x narrower wavefront the
  state is compacted and sliced, so the straggler tail pays 1/4..1/16 of
  the full iteration cost (see sarsa_wavefront for the measured rationale);
* ONE MLP forward per iteration serves BOTH consumers: the Q-values at the
  new hit position are the sampling distribution for the next direction
  AND the TD bootstrap max_a Q(s')*cos for the pending transition into
  that position (the lockstep — like the reference,
  neural_q_pathtracer.cu:315-330 and :443 — forwards twice per bounce);
* training (train mode): per iteration, the pending transitions
  (prev_loc, action, td) train the net through the same sequential
  per-4096-minibatch Adam scan as the lockstep (deep.neural_q.
  train_on_batches), with the pending mask weighting the squared errors;
  all-masked minibatches do not advance Adam.

Deliberate deviations from the lockstep/reference (documented, validated
statistically in tests/test_deep_wavefront.py):

* regeneration REPLACES the learning-only respawn (ref: nn_rendering_
  helpers.cu:241-277): the reference respawns dead rays at random scene
  points purely to keep its batches full of training signal; here a dead
  slot immediately starts a real camera sample, which is on-policy
  training signal AND image progress.  Trained-quality parity with the
  lockstep is asserted by the EVAL harness (MAPE at equal budget).
* epsilon decays per SAMPLE ORDINAL per pixel (a per-lane epsilon
  vector), not per lockstep spp-iteration — the same schedule the
  reference applies (neural_q_pathtracer.cu:544), evaluated per slot
  since samples interleave; the frame returns epsilon advanced by spp
  decays exactly like the lockstep.
* a transition's TD update lands one iteration later than the lockstep's
  relative to the sampling step at the new vertex (sampling at s' uses
  the params BEFORE the update for the transition into s', the lockstep
  uses post-update params) — a one-minibatch param-freshness lag,
  immaterial to SGD.
* bounce-cap exhaustion contributes tp * brdf (the product up to and
  including the capped hit's BRDF, no direction factor) — exactly the
  lockstep's throughput at loop exit.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import (RHO, DeepLearningConfig, RadianceVolumeConfig,
                              RenderConfig)
from rlrpt_tpu.deep.neural_q import (default_optimizer, train_on_batches,
                                     _q_forward)
from rlrpt_tpu.integrators.wavefront import _primary_dirs
from rlrpt_tpu.nn.dq_network import (DQNetworkParams, dq_apply,
                                     dq_apply_relative)
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.ops.intersect_pallas import closest_hit_mat_mxu, pack_scene_mxu
from rlrpt_tpu.ops.linalg import make_frame
from rlrpt_tpu.scene.scene import Scene

_INF_CUT = jnp.float32(1.0e38)
_DRAIN_FACTOR = 4
#: Floor 512 per the r4 sarsa drain ablation (the straggler tail runs at
#: 1/16..1/128 of full width; see integrators/sarsa_wavefront.py).
_MIN_DRAIN_W = 512


class _State(NamedTuple):
    # --- per-slot, sliced at each drain step -----------------------------
    o: jnp.ndarray            # (W, 3)
    d: jnp.ndarray            # (W, 3)
    tp: jnp.ndarray           # (W, 3)
    pixel: jnp.ndarray        # (W,) int32
    kmx: jnp.ndarray          # (W,) int32 pixel-multiplex index
    bounce: jnp.ndarray       # (W,) int32
    remaining: jnp.ndarray    # (W,) int32 samples left after current
    sord: jnp.ndarray         # (W,) int32 sample ordinal (epsilon decay)
    active: jnp.ndarray       # (W,) bool
    sample_rad: jnp.ndarray   # (W, 3)
    slot_rad: jnp.ndarray     # (W, pix_mux, 3)
    prev_loc: jnp.ndarray     # (W, 3) position of the pending action
    action: jnp.ndarray       # (W,) int32, -1 = no pending transition
    # --- global ----------------------------------------------------------
    image: jnp.ndarray        # (n_pix_local, 3)
    path_sum: jnp.ndarray
    zclp: jnp.ndarray
    iters: jnp.ndarray
    loss_sum: jnp.ndarray
    td_sq_sum: jnp.ndarray    # sum of squared TD targets (loss scale)
    light_hits: jnp.ndarray   # int32: samples that terminated on a light
    light_path_sum: jnp.ndarray  # summed path length of those samples
    params: Any
    opt_state: Any


_SLOT_FIELDS = ("o", "d", "tp", "pixel", "kmx", "bounce", "remaining",
                "sord", "active", "sample_rad", "slot_rad", "prev_loc",
                "action")


def _compact(s: _State, wp: int) -> _State:
    act = s.active
    m = jnp.sum(act.astype(jnp.int32))
    arange = jnp.arange(wp, dtype=jnp.int32)
    slot_pos = jnp.where(act, jnp.cumsum(act) - 1, m + jnp.cumsum(~act) - 1)
    perm_src = jnp.zeros((wp,), jnp.int32).at[slot_pos].set(arange)
    return s._replace(**{f: getattr(s, f)[perm_src] for f in _SLOT_FIELDS})


def _sample_q_directions(k_dir, qs, normal, eps_lane, gr: int,
                         grid_rho: float):
    """Fused epsilon-greedy / importance sector sampling for one iteration.

    qs (W, S) Q-values at the hit, normal (W, 3), eps_lane (W,) per-lane
    epsilon.  Returns (direction, sector, pdf).  Matches deep.neural_q.
    sample_directions (ref: nn_rendering_helpers.cu:300-489) including the
    all-zero-Q uniform fallback; epsilon is per-lane here.
    """
    s = gr * gr
    cos = hs.sector_cos_thetas(gr)
    k_eps, k_r, k_rand, k_jit = jax.random.split(k_dir, 4)

    w = qs * cos[None, :]
    total = jnp.sum(w, axis=-1, keepdims=True)
    uniform = jnp.full_like(w, 1.0 / s)
    q_dist = jnp.where(total > 0.0, w / jnp.where(total == 0, 1.0, total),
                       uniform)
    cdf = jnp.cumsum(q_dist, axis=-1)
    n = qs.shape[0]
    r = jax.random.uniform(k_r, (n, 1), dtype=jnp.float32)
    sector_imp = jnp.minimum(jnp.sum(cdf <= r, axis=-1), s - 1) \
        .astype(jnp.int32)
    # One-hot select, not take_along_axis — per-row dynamic indexing is a
    # latency-bound gather on TPU (see volumes.sample_from_cdf_rows).
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, s), 1)
    p_imp = jnp.sum(jnp.where(iota == sector_imp[:, None], q_dist, 0.0),
                    axis=-1)
    pdf_imp = RHO * (p_imp / grid_rho)

    u = jax.random.uniform(k_rand, (qs.shape[0],), dtype=jnp.float32)
    sector_rand = jnp.clip(((u - 1e-4) * s).astype(jnp.int32), 0, s - 1)

    explore = jax.random.uniform(k_eps, (qs.shape[0],)) <= eps_lane
    sector = jnp.where(explore, sector_rand, sector_imp)
    pdf = jnp.where(explore, jnp.float32(RHO), pdf_imp)

    frame = make_frame(normal)
    direction = hs.sample_sector_direction(k_jit, sector, frame, gr)
    return direction, sector, pdf


def trace_frame_deep_wavefront(key, scene: Scene, camera: Camera,
                               params: DQNetworkParams, cfg: RenderConfig,
                               rl: RadianceVolumeConfig,
                               dl: DeepLearningConfig, *,
                               opt_state=None, epsilon=0.0,
                               train: bool = False, pix_mux: int = 1,
                               interpret: bool = False,
                               pix_lo=0, n_pix_local: int | None = None,
                               mlp_dtype: str = "f32", axis_name=None,
                               train_batching: str = "minibatch"):
    """One regenerative deep frame (no jit wrapper; see the renderers).

    Returns (image_sum, params, opt_state, path_sum, zclp, iters,
    loss_sum).  `train=False` freezes the net (pretrained mode, epsilon
    forced to 0 by the caller); `train=True` runs the online TD updates.

    Under shard_map (`axis_name` set, pix_lo/n_pix_local carving this
    device's pixel range) the loop condition is made uniform across
    devices, training gradients are psum'd per minibatch (identical
    replicated Adam update), and the drain cascade runs in lockstep
    (phase exits psum'd) — same scheme as integrators.sarsa_wavefront.

    mlp_dtype "bf16" (inference only) runs the per-iteration Q forward in
    bfloat16 — UNBIASED by construction: the sampler's pdf is computed
    from the exact same (rounded) Q distribution the sector is drawn
    from, so Q precision shifts which directions are favoured, never the
    estimator's expectation; cos/pdf weights stay f32.

    train_batching "minibatch" (default) replays the reference's
    sequential per-4096-ray Adam scan each iteration
    (neural_q_pathtracer.cu:421-513); "fused" takes ONE Adam step per
    iteration over all pending transitions — fewer, larger steps (same
    TD targets), cutting the sequential chain that dominates training
    iterations.
    """
    n_pix = cfg.n_pixels
    n_local = n_pix if n_pix_local is None else n_pix_local
    pix_lo = jnp.int32(pix_lo)
    spp = cfg.samples_per_pixel
    gr = rl.grid_resolution
    w0 = -(-n_local // pix_mux)
    g48, m2 = pack_scene_mxu(scene)
    ns = scene.n_surfaces
    optimizer = default_optimizer(dl) if train else None
    if train_batching not in ("minibatch", "fused"):
        raise ValueError(f"train_batching must be 'minibatch' or 'fused', "
                         f"got {train_batching!r}")
    eps0 = jnp.asarray(epsilon, jnp.float32)
    cos_tbl = hs.sector_cos_thetas(gr)
    if mlp_dtype not in ("f32", "bf16"):
        raise ValueError(f"mlp_dtype must be 'f32' or 'bf16', "
                         f"got {mlp_dtype!r}")
    if train and mlp_dtype != "f32":
        raise ValueError("bf16 forward is inference-only (training keeps "
                         "the reference's f32 numerics)")
    if mlp_dtype == "bf16":
        fwd_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)
    else:
        fwd_params = params

    k_init, k_loop = jax.random.split(key)
    pix0 = pix_lo + jnp.arange(w0, dtype=jnp.int32)
    in_image0 = (pix0 < n_pix) & (pix0 < pix_lo + n_local)
    d0 = _primary_dirs(k_init, pix0, camera, cfg)
    o0 = jnp.broadcast_to(camera.position, d0.shape)
    state = _State(
        o=o0, d=d0, tp=jnp.ones((w0, 3), jnp.float32),
        pixel=pix0, kmx=jnp.zeros((w0,), jnp.int32),
        bounce=jnp.zeros((w0,), jnp.int32),
        remaining=jnp.where(in_image0, spp - 1, 0).astype(jnp.int32),
        sord=jnp.zeros((w0,), jnp.int32),
        active=in_image0,
        sample_rad=jnp.zeros((w0, 3), jnp.float32),
        slot_rad=jnp.zeros((w0, pix_mux, 3), jnp.float32),
        prev_loc=jnp.zeros((w0, 3), jnp.float32),
        action=jnp.full((w0,), -1, jnp.int32),
        image=jnp.zeros((n_local, 3), jnp.float32),
        path_sum=jnp.float32(0.0), zclp=jnp.int32(0), iters=jnp.int32(0),
        loss_sum=jnp.float32(0.0), td_sq_sum=jnp.float32(0.0),
        light_hits=jnp.int32(0), light_path_sum=jnp.float32(0.0),
        params=params, opt_state=opt_state)

    def make_body(wp: int):

        def body(s: _State):
            k_iter = jax.random.fold_in(k_loop, s.iters)
            if cfg.russian_roulette:
                k_dir, k_cam, k_rr = jax.random.split(k_iter, 3)
            else:
                k_dir, k_cam = jax.random.split(k_iter)

            (o, d, tp, pixel, kmx, bounce, remaining, sord, sample_rad,
             slot_rad, prev_loc, action) = (getattr(s, f)
                                            for f in _SLOT_FIELDS
                                            if f != "active")
            act = s.active
            m = wp - jnp.argmax(jnp.flip(act))
            m = jnp.where(jnp.any(act), m, 0).astype(jnp.int32)

            # ---- closest hit up to the last live lane --------------------
            t, tri, mrow = closest_hit_mat_mxu(o, d, g48, m2, m,
                                               interpret=interpret)
            normal = mrow[:, 0:3]
            diffuse3 = mrow[:, 3:6]
            emission3 = mrow[:, 6:9]
            lum = mrow[:, 10]
            missed = act & (t >= _INF_CUT)
            hit_light = act & ~missed & (tri >= ns)
            hit_surface = act & ~missed & (tri < ns)
            # Dead/missed lanes would feed inf into the MLP; clamp.
            qpos = jnp.where(hit_surface[:, None], o + t[:, None] * d, 0.0)

            # ---- ONE forward: sampling distribution + TD bootstrap -------
            if train:
                qs = _q_forward(s.params, scene, qpos, dl)       # (W, S)
            else:
                # Frozen net; every operand is cast so nothing silently
                # promotes the matmuls back to f32.
                dt = fwd_params.layers[0].w.dtype
                if dl.train_on_position:
                    qs = dq_apply(fwd_params, qpos.astype(dt))
                else:
                    qs = dq_apply_relative(fwd_params,
                                           scene.vertices_flat.astype(dt),
                                           qpos.astype(dt))
                qs = qs.astype(jnp.float32)

            # ---- TD train on pending transitions (train mode) ------------
            if train:
                # max_a Q(s')*cos with the reference's scan-seed quirk
                # (Q_0 unweighted; nn_rendering_helpers.cu:91-140).
                weighted = jnp.max(qs[:, 1:] * cos_tbl[None, 1:], axis=-1)
                max_q = jnp.maximum(qs[:, 0], weighted)
                # rewards/discounts per hit type (trace_ray,
                # neural_q_pathtracer.cu:646-752): light -> r = lum*200,
                # gamma=0; miss -> 0; surface -> r=0, gamma=lum.
                td = jnp.where(
                    hit_light, lum * dl.light_reward_scale,
                    jnp.where(hit_surface, lum * max_q, 0.0))
                pending = act & (action >= 0)
                if train_batching == "fused":
                    import dataclasses as _dc
                    dl_t = _dc.replace(dl, batch_size=wp)  # one chunk
                else:
                    dl_t = dl
                params_new, opt_new, loss = train_on_batches(
                    s.params, s.opt_state, optimizer, scene, prev_loc,
                    jnp.maximum(action, 0), jax.lax.stop_gradient(td), dl_t,
                    weights=pending.astype(jnp.float32),
                    axis_name=axis_name)
                loss_sum = s.loss_sum + loss
                # Target scale for the relative-loss diagnostic: absolute
                # squared-error loss grows ~ Q^2 as the net's magnitude
                # converges toward the x200 light reward
                # (neural_q_pathtracer.cu:697) even while RELATIVE error
                # falls; loss_sum / td_sq_sum is the scale-free curve.
                td_sq = jnp.sum(jnp.where(pending, td * td, 0.0))
                if axis_name is not None:
                    td_sq = jax.lax.psum(td_sq, axis_name)
                td_sq_sum = s.td_sq_sum + td_sq
            else:
                params_new, opt_new, loss_sum = (s.params, s.opt_state,
                                                 s.loss_sum)
                td_sq_sum = s.td_sq_sum

            # ---- terminal contributions ----------------------------------
            contrib = (jnp.where(missed[:, None],
                                 tp * cfg.environment_light, 0.0)
                       + jnp.where(hit_light[:, None], tp * emission3, 0.0))

            # ---- sample the next direction from Q*cos --------------------
            if train:
                eps_lane = jnp.maximum(
                    eps0 - dl.epsilon_decay * sord.astype(jnp.float32),
                    dl.epsilon_min)
            else:
                eps_lane = jnp.zeros((wp,), jnp.float32)
            new_d, sector, pdf = _sample_q_directions(
                k_dir, qs, normal, eps_lane, gr, rl.grid_rho)
            cos_theta = jnp.sum(normal * new_d, axis=-1)
            brdf3 = diffuse3 / jnp.pi
            pdf_safe = jnp.maximum(pdf, 1e-12)

            exhausted = hit_surface & (bounce + 1 >= cfg.max_ray_bounces)
            survive = hit_surface & ~exhausted
            # Bounce-cap exhaustion: the lockstep exits its loop right
            # after the capped trace, so the ray's contribution is
            # tp * brdf (no direction factor) — reproduced.
            contrib = contrib + jnp.where(exhausted[:, None],
                                          tp * brdf3, 0.0)
            sample_rad = sample_rad + contrib
            tp = jnp.where(survive[:, None],
                           tp * brdf3 * (cos_theta / pdf_safe)[:, None], tp)

            rr_killed = jnp.zeros_like(survive)
            if cfg.russian_roulette:
                p = jnp.clip(jnp.max(tp, axis=-1), cfg.rr_min_prob, 1.0)
                do_rr = survive & (bounce + 1 >= cfg.rr_start_bounce)
                rr_killed = do_rr & (jax.random.uniform(k_rr, (wp,)) >= p)
                tp = jnp.where((do_rr & ~rr_killed)[:, None],
                               tp / p[:, None], tp)
                survive = survive & ~rr_killed

            o = jnp.where(survive[:, None], qpos + cfg.eps * new_d, o)
            d = jnp.where(survive[:, None], new_d, d)
            bounce = jnp.where(survive, bounce + 1, bounce)
            prev_loc = jnp.where(survive[:, None], qpos, prev_loc)
            action = jnp.where(survive, sector, -1)

            # ---- stats ---------------------------------------------------
            done = missed | hit_light
            fin = (bounce + 1).astype(jnp.float32)
            path_sum = (s.path_sum
                        + jnp.sum(jnp.where(done, fin, 0.0))
                        + jnp.sum(jnp.where(exhausted,
                                            jnp.float32(cfg.max_ray_bounces),
                                            0.0))
                        + jnp.sum(jnp.where(rr_killed, fin, 0.0)))
            finished = act & ~survive
            zero = finished & (jnp.mean(sample_rad, axis=-1)
                               < cfg.throughput_threshold)
            zclp = s.zclp + jnp.sum(zero.astype(jnp.int32))
            # "Guidance finds lights sooner" is only observable on the
            # light-terminated subset: cornell is OPEN at the camera side,
            # so better guidance CONVERTS short escaping paths into longer
            # light-finding ones and the all-paths average rises — the
            # mechanically correct direction for this scene/accounting.
            light_hits = s.light_hits + jnp.sum(hit_light.astype(jnp.int32))
            light_path_sum = s.light_path_sum + jnp.sum(
                jnp.where(hit_light, fin, 0.0))

            # ---- bank finished samples into the slot's per-k row ---------
            ksel = (jax.lax.broadcasted_iota(jnp.int32, (wp, pix_mux), 1)
                    == kmx[:, None]).astype(jnp.float32)
            slot_rad = slot_rad + (ksel[:, :, None]
                                   * jnp.where(finished[:, None], sample_rad,
                                               0.0)[:, None, :])

            # ---- regeneration --------------------------------------------
            next_pix = pixel + w0
            step_k = (finished & (remaining <= 0) & (kmx + 1 < pix_mux)
                      & (next_pix < n_pix) & (next_pix < pix_lo + n_local))
            pixel = jnp.where(step_k, next_pix, pixel)
            kmx = jnp.where(step_k, kmx + 1, kmx)
            remaining = jnp.where(step_k, spp, remaining)
            regen = finished & (remaining > 0)
            rd = _primary_dirs(k_cam, pixel, camera, cfg)
            o = jnp.where(regen[:, None], camera.position[None, :], o)
            d = jnp.where(regen[:, None], rd, d)
            tp = jnp.where(regen[:, None], 1.0, tp)
            sample_rad = jnp.where(regen[:, None], 0.0, sample_rad)
            bounce = jnp.where(regen, 0, bounce)
            # Per-pixel sample ordinal: next sample of the same pixel
            # advances it, a new pixel resets it (epsilon schedule).
            sord = jnp.where(regen, jnp.where(step_k, 0, sord + 1), sord)
            remaining = jnp.where(regen, remaining - 1, remaining)
            action = jnp.where(regen, -1, action)
            active = survive | regen

            return _State(o=o, d=d, tp=tp, pixel=pixel, kmx=kmx,
                          bounce=bounce, remaining=remaining, sord=sord,
                          active=active, sample_rad=sample_rad,
                          slot_rad=slot_rad, prev_loc=prev_loc,
                          action=action, image=s.image, path_sum=path_sum,
                          zclp=zclp, iters=s.iters + 1, loss_sum=loss_sum,
                          td_sq_sum=td_sq_sum, light_hits=light_hits,
                          light_path_sum=light_path_sum,
                          params=params_new, opt_state=opt_new)

        return body

    def _flush(image, pixel, kmx, slot_rad):
        s0 = pixel - pix_lo - kmx * w0
        ks = jnp.arange(pix_mux, dtype=jnp.int32)[None, :]
        idx = s0[:, None] + ks * w0
        valid = (idx >= 0) & (idx < n_local)
        flat = jnp.where(valid, idx, n_local).reshape(-1)
        data = jnp.where(valid[..., None], slot_rad, 0.0).reshape(-1, 3)
        return image.at[flat].add(data, mode="drop")

    # Same uniform drain cascade as integrators.sarsa_wavefront: every
    # device stays in a phase until ALL devices' live sets fit the next
    # width (one psum'd flag per iteration), so compaction + slicing
    # happen in lockstep and the straggler tail runs narrow on every
    # device.
    widths = [w0]
    while widths[-1] // _DRAIN_FACTOR >= _MIN_DRAIN_W:
        widths.append(widths[-1] // _DRAIN_FACTOR)

    for i, wp in enumerate(widths):
        last = i == len(widths) - 1
        w_next = None if last else widths[i + 1]

        def cond(s: _State, w_next=w_next):
            live = jnp.sum(s.active.astype(jnp.int32))
            stay = live > 0 if w_next is None else live > w_next
            if axis_name is not None:
                stay = jax.lax.psum(stay.astype(jnp.int32), axis_name) > 0
            return stay

        state = jax.lax.while_loop(cond, make_body(wp), state)
        if not last:
            state = _compact(state, wp)
            image = _flush(state.image, state.pixel[w_next:],
                           state.kmx[w_next:], state.slot_rad[w_next:])
            state = state._replace(
                image=image,
                **{f: getattr(state, f)[:w_next] for f in _SLOT_FIELDS})

    image = _flush(state.image, state.pixel, state.kmx, state.slot_rad)
    return (image, state.params, state.opt_state, state.path_sum,
            state.zclp, state.iters, state.loss_sum,
            (state.td_sq_sum, state.light_hits, state.light_path_sum))


@partial(jax.jit, static_argnames=("cfg", "rl", "dl", "pix_mux",
                                   "interpret", "mlp_dtype"))
def render_frame_pretrained_wavefront(key, scene: Scene, camera: Camera,
                                      params: DQNetworkParams,
                                      cfg: RenderConfig,
                                      rl: RadianceVolumeConfig,
                                      dl: DeepLearningConfig,
                                      pix_mux: int = 8,
                                      interpret: bool = False,
                                      mlp_dtype: str = "f32"):
    """Fast inference-only render with a frozen net; returns (image, aux).

    Drop-in replacement for deep.pretrained.render_frame_pretrained (pure
    importance sampling, epsilon = 0 — ref: pre_trained_pathtracer.cu:286).
    mlp_dtype='bf16' runs the Q forward on the MXU's native precision
    (unbiased; see trace_frame_deep_wavefront).
    """
    image_sum, _, _, path_sum, zclp, iters, _, extra = \
        trace_frame_deep_wavefront(
            key, scene, camera, params, cfg, rl, dl, train=False,
            pix_mux=pix_mux, interpret=interpret, mlp_dtype=mlp_dtype)
    total = cfg.n_pixels * cfg.samples_per_pixel
    img = (image_sum / cfg.samples_per_pixel).reshape(
        cfg.height, cfg.width, 3)
    _, light_hits, light_path_sum = extra
    aux = {"avg_path_length": path_sum / total,
           "zero_contribution_light_paths": zclp,
           "wavefront_iterations": iters,
           "light_hit_fraction": light_hits / total,
           "avg_light_path_length": light_path_sum
           / jnp.maximum(light_hits, 1).astype(jnp.float32)}
    return img, aux


@partial(jax.jit, static_argnames=("cfg", "rl", "dl", "pix_mux",
                                   "interpret", "train_batching"))
def render_frame_neural_q_wavefront(key, scene: Scene, camera: Camera,
                                    params: DQNetworkParams, opt_state,
                                    epsilon, cfg: RenderConfig,
                                    rl: RadianceVolumeConfig,
                                    dl: DeepLearningConfig,
                                    pix_mux: int = 8,
                                    interpret: bool = False,
                                    train_batching: str = "minibatch"):
    """Fast online-training render; returns (image, params, opt_state,
    epsilon, aux).

    Drop-in replacement for deep.neural_q.render_frame_neural_q with
    frame-aggregate stats (the lockstep reports per-spp stats arrays; the
    regenerative frame interleaves samples, so aux carries the frame
    totals: summed loss, average path length, zero-contribution count).
    """
    image_sum, params, opt_state, path_sum, zclp, iters, loss_sum, extra = \
        trace_frame_deep_wavefront(
            key, scene, camera, params, cfg, rl, dl, opt_state=opt_state,
            epsilon=epsilon, train=True, pix_mux=pix_mux,
            interpret=interpret, train_batching=train_batching)
    total = cfg.n_pixels * cfg.samples_per_pixel
    img = (image_sum / cfg.samples_per_pixel).reshape(
        cfg.height, cfg.width, 3)
    eps_next = jnp.maximum(
        jnp.asarray(epsilon, jnp.float32)
        - dl.epsilon_decay * cfg.samples_per_pixel, dl.epsilon_min)
    td_sq_sum, light_hits, light_path_sum = extra
    aux = {"avg_path_length": path_sum / total,
           "loss": loss_sum,
           # Scale-free training error: absolute loss grows with the Q
           # magnitude (x200 light reward), this does not.
           "loss_rel": loss_sum / jnp.maximum(td_sq_sum, 1e-12),
           "td_sq": td_sq_sum,
           "zero_contribution_light_paths": zclp,
           "wavefront_iterations": iters,
           "light_hit_fraction": light_hits / total,
           "avg_light_path_length": light_path_sum
           / jnp.maximum(light_hits, 1).astype(jnp.float32)}
    return img, params, opt_state, eps_next, aux
