"""Neural-Q frame-time benchmark on the live backend.

The reference's deep tracer loses >100x to host<->device ping-pong
(6 transfers per 4096-ray batch per bounce, 8 GB/s PCIe vs 144 GB/s
on-device — thesis 4_critical_evaluation.tex:283-285).  Our whole
training frame (forward passes, epsilon-greedy trace with the Pallas hit
kernel, TD targets, sequential minibatch Adam) is ONE jitted program with
zero transfers; this harness records what that buys: steady-state seconds
per frame and traced rays/sec for

  * the online-training tracer (deep.neural_q.render_frame_neural_q),
  * the inference-only tracer (deep.pretrained.render_frame_pretrained),

on the cornell box at the reference's config (720x720, 80-bounce cap;
default spp 1 for a per-sample number — the reference trains at 32 spp,
scale linearly).

Usage: python -m rlrpt_tpu.tools.neural_q_bench [--spp 1] [--frames 3]
       [--size 720] [--train-on-position]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import (DeepLearningConfig, RadianceVolumeConfig,
                              RenderConfig)
from rlrpt_tpu.scene import cornell_box


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--size", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=80)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--train-on-position", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args(argv)

    from rlrpt_tpu.deep.neural_q import init_neural_q, render_frame_neural_q
    from rlrpt_tpu.deep.pretrained import render_frame_pretrained

    cfg = RenderConfig(width=args.size, height=args.size,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces)
    rl = RadianceVolumeConfig()
    dl = DeepLearningConfig(batch_size=args.batch_size,
                            train_on_position=args.train_on_position)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    key = jax.random.PRNGKey(1984)
    params, opt_state = init_neural_q(key, scene, dl, rl.grid_resolution)
    total = cfg.n_pixels * cfg.samples_per_pixel

    if not args.skip_train:
        # warm-up: compile + 3 executions (first dispatches over the axon
        # tunnel are slow; time only the steady state), host-fenced
        # (block_until_ready is unreliable over the tunnel).
        eps = 1.0
        acc = jnp.float32(0.0)
        for i in range(3):
            img, params, opt_state, eps, aux = render_frame_neural_q(
                jax.random.fold_in(key, 900 + i), scene, cam, params,
                opt_state, eps, cfg, rl, dl)
            acc = acc + jnp.sum(img)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        lens = []
        for i in range(args.frames):
            img, params, opt_state, eps, aux = render_frame_neural_q(
                jax.random.fold_in(key, i), scene, cam, params, opt_state,
                eps, cfg, rl, dl)
            lens.append(aux["avg_path_length"])
            acc = acc + jnp.sum(img)
        float(acc)
        dt = (time.perf_counter() - t0) / args.frames
        # avg_path_length counts image-forming bounces; learning-only
        # respawned rays trace too, so rays/s from it is a LOWER bound.
        rays = float(jnp.mean(jnp.stack(lens))) * total
        print(json.dumps({
            "which": "neural_q_train", "sec_per_frame": round(dt, 4),
            "spp": args.spp, "size": args.size,
            "image_rays_per_sec_lower_bound": round(rays / dt, 1),
            "final_loss": float(aux["loss"][-1])}), flush=True)

    acc = jnp.float32(0.0)
    for i in range(3):
        img, aux = render_frame_pretrained(jax.random.fold_in(key, 800 + i),
                                           scene, cam, params, cfg, rl, dl)
        acc = acc + jnp.sum(img)
    float(acc)  # warm-up fence (see above)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    lens = []
    for i in range(args.frames):
        img, aux = render_frame_pretrained(jax.random.fold_in(key, 50 + i),
                                           scene, cam, params, cfg, rl, dl)
        lens.append(aux["avg_path_length"])
        acc = acc + jnp.sum(img)
    float(acc)
    dt = (time.perf_counter() - t0) / args.frames
    rays = float(jnp.mean(jnp.stack(lens))) * total
    print(json.dumps({
        "which": "neural_q_pretrained", "sec_per_frame": round(dt, 4),
        "spp": args.spp, "size": args.size,
        "rays_per_sec": round(rays / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
