"""Data-parallel sharded renderers & training steps.

Mapping chosen per SURVEY §2.7:

* rays/pixels shard over the mesh's `rays` axis (`P('rays')`);
* scene arrays, DQN params/optimiser state and the tabular Q-table
  replicate (`P()`);
* per-bounce Q-table scatter contributions and per-minibatch DQN gradients
  are `psum` over ICI inside shard_map — every device then applies the same
  update, keeping replicated state bit-identical without any parameter
  resharding;
* early-exit flags are psum'd so all devices run congruent while_loops
  (a collective inside a while_loop requires identical trip counts).

Multi-host: the same functions work after `jax.distributed.initialize()` —
the mesh simply spans all processes' devices and the psums ride
ICI-within-slice / DCN-between-slices as laid out by XLA.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import DeepLearningConfig, RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.deep import neural_q as nq
from rlrpt_tpu.integrators.default_tracer import trace_sample
from rlrpt_tpu.integrators.reinforcement_tracer import trace_sample_sarsa
from rlrpt_tpu.parallel.mesh import RAY_AXIS, make_mesh, pad_to_multiple
from rlrpt_tpu.radiance.volumes import RadianceVolumes, rebuild_cdf
from rlrpt_tpu.scene.scene import Scene


def _padded_rays(key, camera, cfg: RenderConfig, n_dev: int):
    """Primary rays for the full frame, padded to a devices multiple.

    Pad rays point along +z from the camera; their results are dropped."""
    o, d = primary_rays(key, camera, cfg.width, cfg.height, cfg.focal)
    r = o.shape[0]
    pad = pad_to_multiple(r, n_dev) - r
    if pad:
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1], (pad, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1], (pad, 3))])
    return o, d, r


@lru_cache(maxsize=None)
def _default_dp_frame(mesh, cfg: RenderConfig):
    """Build (once per (mesh, cfg)) the jitted sharded default-trace frame.

    Scene and camera are traced arguments, so re-invoking with the same mesh
    and config never re-traces (ADVICE r1: a per-call @jax.jit closure made
    every repeat recompile, contaminating the scaling bench)."""
    n_dev = mesh.devices.size

    @jax.jit
    def frame(key, scene, camera):
        def shard_fn(key, o, d, scene_r):
            # Per-device decorrelated keys.
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            rad, plen = trace_sample(key, o, d, scene_r, cfg)
            return rad, plen

        traced = shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P()),
                           out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
                           check_vma=False)

        def sample_body(i, carry):
            acc, path_acc = carry
            kcam = jax.random.fold_in(jax.random.fold_in(key, i), 1)
            ktrace = jax.random.fold_in(jax.random.fold_in(key, i), 2)
            o, d, r = _padded_rays(kcam, camera, cfg, n_dev)
            rad, plen = traced(ktrace, o, d, scene)
            return acc + rad[:r], path_acc + plen[:r]

        n = cfg.n_pixels
        acc, path_acc = jax.lax.fori_loop(
            0, cfg.samples_per_pixel, sample_body,
            (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.int32)))
        img = (acc / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
        avg = jnp.mean(path_acc.astype(jnp.float32)) / cfg.samples_per_pixel
        return img, {"avg_path_length": avg}

    return frame


def render_default_dp(key, scene: Scene, camera: Camera, cfg: RenderConfig,
                      mesh=None):
    """Sharded default path trace; returns (image (H,W,3), aux).

    The bounce loop has no cross-device state, so each device traces its ray
    shard fully independently — zero collectives until image assembly.
    The compiled frame is cached per (mesh, cfg); repeat calls only execute.
    """
    mesh = mesh or make_mesh()
    return _default_dp_frame(mesh, cfg)(key, scene, camera)


def render_frame_sarsa_dp(key, scene: Scene, camera: Camera,
                          vols: RadianceVolumes, cfg: RenderConfig,
                          rl: RadianceVolumeConfig, mesh=None):
    """Sharded SARSA learning frame; returns (image, volumes, aux).

    The Q-table stays replicated; each bounce's TD contributions are psum'd
    (see radiance.volumes.expected_sarsa_update) so all devices apply one
    identical deterministic update.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    scene = scene.to_device()  # closed over inside jit (Scene.to_device)

    @jax.jit
    def frame(key, vols):
        def shard_fn(key, o, d, vols_r):
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            rad, plen, vols_out = trace_sample_sarsa(
                key, o, d, scene, vols_r, cfg, rl, axis_name=RAY_AXIS)
            return rad, plen, vols_out

        traced = shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P()),
                           out_specs=(P(RAY_AXIS), P(RAY_AXIS), P()),
                           check_vma=False)

        def sample_body(i, carry):
            acc, path_acc, zclp, vols_c = carry
            kcam = jax.random.fold_in(jax.random.fold_in(key, i), 1)
            ktrace = jax.random.fold_in(jax.random.fold_in(key, i), 2)
            o, d, r = _padded_rays(kcam, camera, cfg, n_dev)
            rad, plen, vols_c = traced(ktrace, o, d, vols_c)
            rad, plen = rad[:r], plen[:r]
            zero = jnp.mean(rad, axis=-1) < cfg.throughput_threshold
            return (acc + rad, path_acc + plen, zclp + jnp.sum(zero), vols_c)

        n = cfg.n_pixels
        acc, path_acc, zclp, vols = jax.lax.fori_loop(
            0, cfg.samples_per_pixel, sample_body,
            (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.int32),
             jnp.int32(0), vols))
        vols = rebuild_cdf(vols, rl.distribution_threshold,
                           rl.defensive_mix)
        img = (acc / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
        aux = {"avg_path_length": jnp.mean(path_acc.astype(jnp.float32))
               / cfg.samples_per_pixel,
               "zero_contribution_light_paths": zclp}
        return img, vols, aux

    return frame(key, vols)


def render_frame_sarsa_wavefront_dp(key, scene: Scene, camera: Camera,
                                    vols: RadianceVolumes, grid,
                                    cfg: RenderConfig,
                                    rl: RadianceVolumeConfig, mesh=None,
                                    pix_mux: int = 4,
                                    interpret: bool = False):
    """Sharded fast SARSA frame (regenerative wavefront + bucketed NN).

    Each device owns a contiguous pixel range and its own wavefront; the
    per-iteration Q contributions are psum'd (identical replicated Q
    update), and the loop condition is uniform so every device runs the
    same trip count.  Returns (image, volumes, aux) like
    integrators.sarsa_wavefront.render_frame_sarsa_wavefront.
    """
    from rlrpt_tpu.integrators.sarsa_wavefront import \
        trace_frame_sarsa_wavefront

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    scene = scene.to_device()  # closed over inside jit (Scene.to_device)
    n_pix = cfg.n_pixels
    n_local = -(-n_pix // n_dev)

    @jax.jit
    def frame(key, vols, grid):
        def shard_fn(key, vols_r, grid_r):
            i = jax.lax.axis_index(RAY_AXIS)
            key = jax.random.fold_in(key, i)
            img, vols_out, path_sum, zclp, iters, td_count, _, _ = \
                trace_frame_sarsa_wavefront(
                    key, scene, camera, vols_r, grid_r, cfg, rl,
                    pix_mux=pix_mux, axis_name=RAY_AXIS,
                    interpret=interpret, pix_lo=i * n_local,
                    n_pix_local=n_local)
            path_sum = jax.lax.psum(path_sum, RAY_AXIS)
            zclp = jax.lax.psum(zclp, RAY_AXIS)
            return img, vols_out, path_sum, zclp, iters, td_count

        traced = shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P(), P()),
                           out_specs=(P(RAY_AXIS), P(), P(), P(), P(), P()),
                           check_vma=False)
        img_sum, vols_out, path_sum, zclp, iters, td_count = traced(
            key, vols, grid)
        img_sum = img_sum[:n_pix]
        vols_out = rebuild_cdf(vols_out, rl.distribution_threshold,
                               rl.defensive_mix)
        total = n_pix * cfg.samples_per_pixel
        img = (img_sum / cfg.samples_per_pixel).reshape(
            cfg.height, cfg.width, 3)
        aux = {"avg_path_length": path_sum / total,
               "zero_contribution_light_paths": zclp,
               "wavefront_iterations": iters,
               "td_scatter_count": td_count}
        return img, vols_out, aux

    return frame(key, vols, grid)


def neural_q_train_step_dp(key, scene: Scene, camera: Camera, params,
                           opt_state, epsilon, cfg: RenderConfig,
                           rl: RadianceVolumeConfig, dl: DeepLearningConfig,
                           mesh=None, use_pallas: bool = True,
                           interpret: bool | None = None):
    """One sharded neural-Q training sample (the full training step:
    forward, epsilon-greedy wavefront trace, TD targets, psum'd gradients,
    sequential minibatch Adam — the dryrun_multichip target).

    Returns (throughput (R,3), params, opt_state, loss).
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    scene = scene.to_device()  # closed over inside jit (Scene.to_device)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    optimizer = nq.default_optimizer(dl)
    # Each device sees 1/D of every global minibatch; shrinking the local
    # batch keeps the reference's global 4096-ray minibatch semantics after
    # the gradient psum.
    dl = dataclasses.replace(dl, batch_size=max(1, dl.batch_size // n_dev))

    @jax.jit
    def step(key, params, opt_state):
        def shard_fn(key, o, d, params, opt_state):
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            hit_fn = nq._make_hit_fn(scene, cfg, use_pallas, interpret)
            state, params, opt_state, loss = nq._trace_sample(
                key, scene, camera, params, opt_state, optimizer, epsilon,
                cfg, rl, dl, axis_name=RAY_AXIS, rays=(o, d), hit_fn=hit_fn)
            return state.throughput, params, opt_state, loss

        traced = shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(), P()),
                           out_specs=(P(RAY_AXIS), P(), P(), P()),
                           check_vma=False)

        kcam, ktrace = jax.random.split(key)
        o, d, r = _padded_rays(kcam, camera, cfg, n_dev)
        tp, params, opt_state, loss = traced(ktrace, o, d, params, opt_state)
        return tp[:r], params, opt_state, loss

    return step(key, params, opt_state)


def render_frame_pretrained_wavefront_dp(key, scene: Scene, camera: Camera,
                                         params, cfg: RenderConfig,
                                         rl: RadianceVolumeConfig,
                                         dl: DeepLearningConfig, mesh=None,
                                         pix_mux: int = 4,
                                         interpret: bool = False,
                                         mlp_dtype: str = "f32"):
    """Sharded regenerative pretrained render (frozen net).

    Each device owns a contiguous pixel range and its own wavefront; the
    net replicates, and the only per-iteration collective is the 1-int
    psum that keeps the while-loop condition uniform across devices
    (inference needs no data collectives; training adds per-minibatch
    grad psums on top).  Returns (image, aux) like
    deep_wavefront.render_frame_pretrained_wavefront.
    """
    from rlrpt_tpu.deep.deep_wavefront import trace_frame_deep_wavefront

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    scene = scene.to_device()
    n_pix = cfg.n_pixels
    n_local = -(-n_pix // n_dev)

    @jax.jit
    def frame(key, params):
        def shard_fn(key, params_r):
            i = jax.lax.axis_index(RAY_AXIS)
            key = jax.random.fold_in(key, i)
            img, _, _, path_sum, zclp, iters, _, _ = \
                trace_frame_deep_wavefront(
                    key, scene, camera, params_r, cfg, rl, dl, train=False,
                    pix_mux=pix_mux, interpret=interpret,
                    pix_lo=i * n_local, n_pix_local=n_local,
                    mlp_dtype=mlp_dtype, axis_name=RAY_AXIS)
            path_sum = jax.lax.psum(path_sum, RAY_AXIS)
            zclp = jax.lax.psum(zclp, RAY_AXIS)
            return img, path_sum, zclp, iters

        traced = shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P()),
                           out_specs=(P(RAY_AXIS), P(), P(), P()),
                           check_vma=False)
        img_sum, path_sum, zclp, iters = traced(key, params)
        img_sum = img_sum[:n_pix]
        total = n_pix * cfg.samples_per_pixel
        img = (img_sum / cfg.samples_per_pixel).reshape(
            cfg.height, cfg.width, 3)
        aux = {"avg_path_length": path_sum / total,
               "zero_contribution_light_paths": zclp,
               "wavefront_iterations": iters}
        return img, aux

    return frame(key, params)


def render_frame_neural_q_wavefront_dp(key, scene: Scene, camera: Camera,
                                       params, opt_state, epsilon,
                                       cfg: RenderConfig,
                                       rl: RadianceVolumeConfig,
                                       dl: DeepLearningConfig, mesh=None,
                                       pix_mux: int = 4,
                                       interpret: bool = False):
    """Sharded regenerative neural-Q training frame.

    Per-minibatch gradients are psum'd over the ray axis before the
    replicated Adam update; the local minibatch shrinks by the device
    count so the GLOBAL minibatch keeps the reference's 4096-ray
    semantics.  Returns (image, params, opt_state, epsilon, aux) like
    deep_wavefront.render_frame_neural_q_wavefront.
    """
    from rlrpt_tpu.deep.deep_wavefront import trace_frame_deep_wavefront

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    scene = scene.to_device()
    n_pix = cfg.n_pixels
    n_local = -(-n_pix // n_dev)
    dl_local = dataclasses.replace(dl,
                                   batch_size=max(1, dl.batch_size // n_dev))

    @jax.jit
    def frame(key, params, opt_state):
        def shard_fn(key, params_r, opt_r):
            i = jax.lax.axis_index(RAY_AXIS)
            key = jax.random.fold_in(key, i)
            (img, params_out, opt_out, path_sum, zclp, iters, loss,
             _) = trace_frame_deep_wavefront(
                    key, scene, camera, params_r, cfg, rl, dl_local,
                    opt_state=opt_r, epsilon=epsilon, train=True,
                    pix_mux=pix_mux, interpret=interpret,
                    pix_lo=i * n_local, n_pix_local=n_local,
                    axis_name=RAY_AXIS)
            path_sum = jax.lax.psum(path_sum, RAY_AXIS)
            zclp = jax.lax.psum(zclp, RAY_AXIS)
            return img, params_out, opt_out, path_sum, zclp, iters, loss

        traced = shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P(), P()),
                           out_specs=(P(RAY_AXIS), P(), P(), P(), P(), P(),
                                      P()),
                           check_vma=False)
        img_sum, params_out, opt_out, path_sum, zclp, iters, loss = traced(
            key, params, opt_state)
        img_sum = img_sum[:n_pix]
        total = n_pix * cfg.samples_per_pixel
        img = (img_sum / cfg.samples_per_pixel).reshape(
            cfg.height, cfg.width, 3)
        eps_next = jnp.maximum(
            jnp.asarray(epsilon, jnp.float32)
            - dl.epsilon_decay * cfg.samples_per_pixel, dl.epsilon_min)
        aux = {"avg_path_length": path_sum / total,
               "loss": loss,
               "zero_contribution_light_paths": zclp,
               "wavefront_iterations": iters}
        return img, params_out, opt_out, eps_next, aux

    return frame(key, params, opt_state)


def render_guided_mega_dp(key, scene: Scene, camera: Camera, table,
                          cfg: RenderConfig, mesh=None, pix_mux: int = 32,
                          r_tile: int = 1024, interpret: bool = False,
                          precision: str = "high3"):
    """Sharded guided-megakernel inference (ops.guided_mega): classic
    seed-parallel Monte Carlo — every device renders the full frame at
    spp / n_dev with a decorrelated key and the images pmean at the end
    (ONE collective; the estimator is exactly the single-chip one at the
    same total spp).  spp must divide by the mesh size.
    """
    import dataclasses

    from rlrpt_tpu.ops.guided_mega import render_guided_mega

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if cfg.samples_per_pixel % n_dev:
        raise ValueError(f"spp {cfg.samples_per_pixel} must divide the "
                         f"mesh size {n_dev}")
    cfg_local = dataclasses.replace(
        cfg, samples_per_pixel=cfg.samples_per_pixel // n_dev)
    scene = scene.to_device()

    @jax.jit
    def run(key, table):
        def shard_fn(key, table):
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            img, aux = render_guided_mega(
                key, scene, camera, table, cfg_local, r_tile=r_tile,
                pix_mux=pix_mux, interpret=interpret, precision=precision)
            img = jax.lax.pmean(img, RAY_AXIS)
            plen = jax.lax.pmean(aux["avg_path_length"], RAY_AXIS)
            return img, plen

        traced = shard_map(shard_fn, mesh=mesh, in_specs=(P(), P()),
                           out_specs=(P(), P()), check_vma=False)
        return traced(key, table)

    img, plen = run(key, table)
    return img, {"avg_path_length": plen}


def sarsa_mega_train_dp(key, scene: Scene, camera: Camera, table, q, visits,
                        cfg: RenderConfig, radiance_threshold: float,
                        mesh=None, pix_mux: int = 32, r_tile: int = 1024,
                        interpret: bool = False):
    """Sharded in-kernel binned-SARSA learning frame
    (ops.guided_mega_train): each device runs the full learning frame at
    spp / n_dev from the SAME starting (q, visits), then the per-device
    updates merge by the exact composition algebra of the running mean:

        q_i = (q0*(1+v0) + S_i) / (1+v0+c_i)   per device
        =>  S_i, c_i recoverable;  merged q = (q0*(1+v0) + sum S_i)
                                              / (1+v0+ sum c_i)

    Within-device iteration batches bootstrapped from their own evolving
    local Q, so the merge is a valid deterministic serialisation of the
    same per-ray contributions rather than a bitwise replay of the
    single-chip order — precisely the freedom the reference's racy
    atomics already exercise (thesis 4_critical_evaluation.tex:266).
    Visit counts stay exact (sum of per-device deltas).
    """
    import dataclasses

    from rlrpt_tpu.ops.guided_mega_train import render_sarsa_mega_train

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if cfg.samples_per_pixel % n_dev:
        raise ValueError(f"spp {cfg.samples_per_pixel} must divide the "
                         f"mesh size {n_dev}")
    cfg_local = dataclasses.replace(
        cfg, samples_per_pixel=cfg.samples_per_pixel // n_dev)
    scene = scene.to_device()

    @jax.jit
    def run(key, table, q0, v0):
        def shard_fn(key, table, q0, v0):
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            img, q_i, v_i, aux = render_sarsa_mega_train(
                key, scene, camera, table, q0, v0, cfg_local,
                radiance_threshold, r_tile=r_tile, pix_mux=pix_mux,
                interpret=interpret)
            # Recover this device's contribution sums and counts, psum,
            # and apply one identical merged update on every device.
            c_i = v_i - v0
            s_i = q_i * (1.0 + v0 + c_i) - q0 * (1.0 + v0)
            s_all = jax.lax.psum(s_i, RAY_AXIS)
            c_all = jax.lax.psum(c_i, RAY_AXIS)
            q_new = (q0 * (1.0 + v0) + s_all) / (1.0 + v0 + c_all)
            q_new = jnp.maximum(q_new, radiance_threshold)
            q_new = jnp.where(c_all > 0, q_new, q0)
            img = jax.lax.pmean(img, RAY_AXIS)
            td = jax.lax.psum(aux["td_scatter_count"], RAY_AXIS)
            return img, q_new, v0 + c_all, td

        traced = shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(), P(), P(), P()),
                           out_specs=(P(), P(), P(), P()), check_vma=False)
        return traced(key, table, q0, v0)

    img, q_new, v_new, td = run(key, table, q, visits)
    return img, q_new, v_new, {"td_scatter_count": td}
