"""Multi-scene batch rendering sharded across devices.

BASELINE.json config #5 (archway + Medieval_House batch): the scene axis is
distributed over the mesh, every device renders its scene slice with a
fully local bounce loop — zero collectives until the images are gathered.

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
