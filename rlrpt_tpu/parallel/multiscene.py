"""Multi-scene batch rendering & joint deep-Q training sharded across
devices.

BASELINE.json config #5: "multi-scene batch render sharded across hosts
with DQN grad all-reduce".  Two entry points:

* render_multiscene_dp — the batch RENDER: the scene axis is distributed
  over the mesh, every device renders its scene slice with a fully local
  bounce loop, zero collectives until the images gather;
* train_multiscene_deep_dp — the TRAINING composition: each device runs
  the production regenerative deep wavefront (deep.deep_wavefront) on
  ITS OWN scene while all devices share ONE replicated DQ network —
  per-minibatch gradients are psum'd over the scene axis inside the
  bounce loop (deep.neural_q.train_on_batches), so every device applies
  the identical Adam update and the net trains JOINTLY on all scenes.
  The net is scene-shape-agnostic through the factored relative
  encoding (nn.dq_network.dq_apply_relative): scenes pad to a common
  triangle count (degenerate zero-area triangles are never hit and
  contribute constant zeros to the encoding), so one (3*3*T_pad)-input
  net serves every scene and the gradient psum is well-typed.

Scenes are padded to a common (surfaces, lights) shape with degenerate
triangles (zero-area -> det == 0, never hit), so `n_surfaces` is uniform
and one compiled program serves every scene.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.integrators.default_tracer import trace_sample
from rlrpt_tpu.parallel.mesh import RAY_AXIS, make_mesh
from rlrpt_tpu.scene.scene import Scene


def pad_scene(scene: Scene, ns: int, nl: int) -> Scene:
    """Pad to `ns` surfaces + `nl` lights with degenerate triangles."""
    def pad_block(arr, count, at):
        pad = np.zeros((count,) + arr.shape[1:], arr.dtype)
        return jnp.asarray(np.concatenate(
            [np.asarray(arr[:at]), pad, np.asarray(arr[at:])], axis=0))

    s_pad = ns - scene.n_surfaces
    l_pad = nl - scene.n_lights
    assert s_pad >= 0 and l_pad >= 0
    at = scene.n_surfaces

    def pad_field(arr):
        out = pad_block(arr, s_pad, at)
        if l_pad:
            pad = jnp.zeros((l_pad,) + arr.shape[1:], arr.dtype)
            out = jnp.concatenate([out, pad], axis=0)
        return out

    return Scene(
        v0=pad_field(scene.v0), v1=pad_field(scene.v1),
        v2=pad_field(scene.v2), normal=pad_field(scene.normal),
        diffuse_c=pad_field(scene.diffuse_c),
        emission=pad_field(scene.emission),
        luminance=pad_field(scene.luminance), n_surfaces=ns)


def stack_scenes(scenes: Sequence[Scene]) -> Scene:
    """Stack scenes into one batched pytree (leading scene axis)."""
    ns = max(s.n_surfaces for s in scenes)
    nl = max(s.n_lights for s in scenes)
    padded = [pad_scene(s, ns, nl) for s in scenes]
    return Scene(
        v0=jnp.stack([s.v0 for s in padded]),
        v1=jnp.stack([s.v1 for s in padded]),
        v2=jnp.stack([s.v2 for s in padded]),
        normal=jnp.stack([s.normal for s in padded]),
        diffuse_c=jnp.stack([s.diffuse_c for s in padded]),
        emission=jnp.stack([s.emission for s in padded]),
        luminance=jnp.stack([s.luminance for s in padded]),
        n_surfaces=ns)


def render_multiscene_dp(key, scenes: Sequence[Scene],
                         cameras: Sequence[Camera], cfg: RenderConfig,
                         mesh=None) -> jnp.ndarray:
    """Render each scene with its camera, scenes sharded over the mesh.

    Returns images (n_scenes, H, W, 3).  The scene list is repeated up to a
    devices multiple; duplicates are dropped from the output.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = len(scenes)
    reps = -(-n // n_dev) * n_dev  # round up to a devices multiple
    idx = [i % n for i in range(reps)]
    batched = stack_scenes([scenes[i] for i in idx])
    cam_pos = jnp.stack([cameras[i % n].position for i in idx])
    cam_yy = jnp.stack([cameras[i % n].yaw_y for i in idx])
    cam_yx = jnp.stack([cameras[i % n].yaw_x for i in idx])
    ns_static = batched.n_surfaces

    @jax.jit
    def run(key, batched, cam_pos, cam_yy, cam_yx):
        def shard_fn(key, sv0, sv1, sv2, snrm, sdif, semi, slum,
                     cpos, cyy, cyx):
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))

            def render_one(args):
                v0, v1, v2, nrm, dif, emi, lum, cp, yy, yx = args
                scene = Scene(v0=v0, v1=v1, v2=v2, normal=nrm, diffuse_c=dif,
                              emission=emi, luminance=lum,
                              n_surfaces=ns_static)
                cam = Camera(position=cp, yaw_y=yy, yaw_x=yx)

                def sample_body(i, acc):
                    from rlrpt_tpu.camera import primary_rays
                    kcam = jax.random.fold_in(jax.random.fold_in(key, i), 1)
                    ktr = jax.random.fold_in(jax.random.fold_in(key, i), 2)
                    o, d = primary_rays(kcam, cam, cfg.width, cfg.height,
                                        cfg.focal)
                    rad, _ = trace_sample(ktr, o, d, scene, cfg)
                    return acc + rad

                acc = jax.lax.fori_loop(
                    0, cfg.samples_per_pixel, sample_body,
                    jnp.zeros((cfg.n_pixels, 3), jnp.float32))
                return (acc / cfg.samples_per_pixel).reshape(
                    cfg.height, cfg.width, 3)

            return jax.lax.map(render_one, (sv0, sv1, sv2, snrm, sdif, semi,
                                            slum, cpos, cyy, cyx))

        sharded = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(),) + (P(RAY_AXIS),) * 10,
            out_specs=P(RAY_AXIS), check_vma=False)
        return sharded(key, batched.v0, batched.v1, batched.v2,
                       batched.normal, batched.diffuse_c, batched.emission,
                       batched.luminance, cam_pos, cam_yy, cam_yx)

    imgs = run(key, batched, cam_pos, cam_yy, cam_yx)
    return imgs[:n]


def init_multiscene_neural_q(key, scenes: Sequence[Scene], dl,
                             grid_resolution: int = 12):
    """Initialise ONE shared DQ network sized for the padded scene batch.

    The relative encoding's input dim is 3 * 3 * T_pad (ref:
    neural_q_pathtracer.cu:49, dq_network.cu:8-17), so the net must be
    built against the PADDED triangle count — returns (params, opt_state,
    batched_scene) with the stacked/padded scenes it was sized for.
    """
    from rlrpt_tpu.deep.neural_q import default_optimizer
    from rlrpt_tpu.nn.dq_network import dq_init

    batched = stack_scenes(scenes)
    t_pad = batched.v0.shape[1]
    input_dim = 3 if dl.train_on_position else t_pad * 9
    params = dq_init(key, input_dim, grid_resolution * grid_resolution,
                     dl.hidden_sizes)
    opt_state = default_optimizer(dl).init(params)
    return params, opt_state, batched


def train_multiscene_deep_dp(key, scenes: Sequence[Scene],
                             cameras: Sequence[Camera], params, opt_state,
                             epsilon, cfg: RenderConfig, rl, dl, mesh=None,
                             pix_mux: int = 2, interpret: bool = False,
                             batched: Scene | None = None):
    """One joint deep-Q training frame over a batch of scenes.

    Each device owns one scene (the list is repeated up to a devices
    multiple) and runs the full regenerative deep-wavefront training
    frame on it; per-minibatch DQN gradients are psum'd over the scene
    axis (the BASELINE #5 "DQN grad all-reduce"), so the replicated
    params receive one identical joint update per minibatch.  The
    while-loop condition is psum'd too (uniform trip counts across
    scenes of different depth).

    Returns (images (n_scenes, H, W, 3), params, opt_state, epsilon,
    aux) with aux carrying per-scene zclp/path-length plus the joint
    training loss.  `params` must come from init_multiscene_neural_q
    over the same scene list (the padded triangle count fixes the input
    dim); pass its `batched` result to skip re-stacking.
    """
    from rlrpt_tpu.deep.deep_wavefront import trace_frame_deep_wavefront

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = len(scenes)
    reps = -(-n // n_dev) * n_dev
    idx = [i % n for i in range(reps)]
    if batched is None or batched.v0.ndim != 3 \
            or batched.v0.shape[0] != reps:
        batched = stack_scenes([scenes[i] for i in idx])
    cam_pos = jnp.stack([cameras[i % n].position for i in idx])
    cam_yy = jnp.stack([cameras[i % n].yaw_y for i in idx])
    cam_yx = jnp.stack([cameras[i % n].yaw_x for i in idx])
    ns_static = batched.n_surfaces
    eps0 = jnp.asarray(epsilon, jnp.float32)

    @jax.jit
    def run(key, batched, cam_pos, cam_yy, cam_yx, params, opt_state):
        def shard_fn(key, v0, v1, v2, nrm, dif, emi, lum, cpos, cyy, cyx,
                     params, opt_state):
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            scene_r = Scene(v0=v0[0], v1=v1[0], v2=v2[0], normal=nrm[0],
                            diffuse_c=dif[0], emission=emi[0],
                            luminance=lum[0], n_surfaces=ns_static)
            cam = Camera(position=cpos[0], yaw_y=cyy[0], yaw_x=cyx[0])
            (img, params_out, opt_out, path_sum, zclp, iters, loss,
             _extra) = trace_frame_deep_wavefront(
                key, scene_r, cam, params, cfg, rl, dl,
                opt_state=opt_state, epsilon=eps0, train=True,
                pix_mux=pix_mux, interpret=interpret, axis_name=RAY_AXIS)
            # grads/loss were psum'd per minibatch -> params_out/loss are
            # bit-identical on every device (replicated out_specs).
            return (img[None], params_out, opt_out, loss,
                    path_sum[None], zclp[None], iters)

        sharded = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(),) + (P(RAY_AXIS),) * 10 + (P(), P()),
            out_specs=(P(RAY_AXIS), P(), P(), P(), P(RAY_AXIS),
                       P(RAY_AXIS), P()),
            check_vma=False)
        return sharded(key, batched.v0, batched.v1, batched.v2,
                       batched.normal, batched.diffuse_c, batched.emission,
                       batched.luminance, cam_pos, cam_yy, cam_yx,
                       params, opt_state)

    img_sum, params, opt_state, loss, path_sum, zclp, iters = run(
        key, batched, cam_pos, cam_yy, cam_yx, params, opt_state)
    total = cfg.n_pixels * cfg.samples_per_pixel
    imgs = (img_sum[:n] / cfg.samples_per_pixel).reshape(
        n, cfg.height, cfg.width, 3)
    eps_next = jnp.maximum(
        eps0 - dl.epsilon_decay * cfg.samples_per_pixel, dl.epsilon_min)
    aux = {"loss": loss,
           "avg_path_length": path_sum[:n] / total,
           "zero_contribution_light_paths": zclp[:n],
           "wavefront_iterations": iters}
    return imgs, params, opt_state, eps_next, aux
