"""Neural-Q frame-time benchmark on the live backend.

The reference's deep tracer loses >100x to host<->device ping-pong
(6 transfers per 4096-ray batch per bounce, 8 GB/s PCIe vs 144 GB/s
on-device — thesis 4_critical_evaluation.tex:283-285).  Our deep tracers
are single jitted programs with zero transfers; this harness records what
that buys, for both schedules:

  * lockstep (`--impl lockstep`): deep.neural_q / deep.pretrained — the
    reference's wavefront advanced full-width every bounce;
  * regenerative (`--impl wavefront`, default): deep.deep_wavefront — the
    sarsa_wavefront slot model (sample regeneration, pixel multiplexing,
    cascaded drain) with ONE fused MLP forward per iteration serving both
    the sampling distribution and the TD bootstrap.

Emits one JSON line per variant: steady-state sec/frame + traced rays/s
on the cornell box at the reference's config (720x720, 80-bounce cap;
default spp 1 for a per-sample number).

Usage: python -m rlrpt_tpu.tools.neural_q_bench [--impl wavefront]
       [--spp 1] [--frames 3] [--size 720] [--pix-mux 8] [--skip-train]
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


def _measure(fn, key, frames: int, warmups: int = 3):
    """Steady-state (sec/frame, mean path length) — warm-up + host fences
    (block_until_ready is unreliable over the axon tunnel)."""
    acc = jnp.float32(0.0)
    for i in range(warmups):
        probe, _ = fn(jax.random.fold_in(key, 900 + i))
        acc = acc + probe
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    lens = []
    for i in range(frames):
        probe, plen = fn(jax.random.fold_in(key, i))
        lens.append(plen)
        acc = acc + probe
    float(acc)
    dt = (time.perf_counter() - t0) / frames
    return dt, sum(float(p) for p in lens) / len(lens)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=("wavefront", "lockstep"),
                    default="wavefront")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--size", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=80)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--pix-mux", type=int, default=8,
                    help="wavefront impl: pixels multiplexed per slot")
    ap.add_argument("--train-on-position", action="store_true")
    ap.add_argument("--mlp-dtype", choices=("f32", "bf16"), default="f32",
                    help="pretrained-wavefront forward precision")
    ap.add_argument("--train-batching", choices=("minibatch", "fused"),
                    default="minibatch",
                    help="wavefront trainer: the reference's sequential "
                         "4096-ray Adam scan, or ONE step per iteration")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-pretrained", action="store_true")
    args = ap.parse_args(argv)

    cfg = RenderConfig(width=args.size, height=args.size,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces)
    rl = RadianceVolumeConfig()
    dl = DeepLearningConfig(batch_size=args.batch_size,
                            train_on_position=args.train_on_position)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    key = jax.random.PRNGKey(1984)

    from rlrpt_tpu.deep.neural_q import init_neural_q
    params, opt_state = init_neural_q(key, scene, dl, rl.grid_resolution)
    total = cfg.n_pixels * cfg.samples_per_pixel
    # Pallas kernels need interpret mode on the CPU backend (smoke tests).
    interp = jax.default_backend() == "cpu"

    if not args.skip_train:
        if args.impl == "wavefront":
            from rlrpt_tpu.deep.deep_wavefront import (
                render_frame_neural_q_wavefront)
            # Mutable training state threaded outside the timed closure
            # (the bench measures the frame step at a steady state; params
            # keep training across reps like the reference's frames).
            box = {"params": params, "opt": opt_state, "eps": 1.0}

            def run_train(k):
                img, p, o, e, aux = render_frame_neural_q_wavefront(
                    k, scene, cam, box["params"], box["opt"], box["eps"],
                    cfg, rl, dl, pix_mux=args.pix_mux, interpret=interp,
                    train_batching=args.train_batching)
                box.update(params=p, opt=o, eps=e)
                box["loss"] = aux["loss"]
                return jnp.sum(img), aux["avg_path_length"]
        else:
            from rlrpt_tpu.deep.neural_q import render_frame_neural_q
            box = {"params": params, "opt": opt_state, "eps": 1.0}

            def run_train(k):
                img, p, o, e, aux = render_frame_neural_q(
                    k, scene, cam, box["params"], box["opt"], box["eps"],
                    cfg, rl, dl, interpret=interp)
                box.update(params=p, opt=o, eps=e)
                box["loss"] = aux["loss"][-1]
                return jnp.sum(img), aux["avg_path_length"]

        dt, plen = _measure(run_train, key, args.frames)
        out = {"which": f"neural_q_train_{args.impl}",
               "sec_per_frame": round(dt, 4), "spp": args.spp,
               "size": args.size, "pix_mux": args.pix_mux,
               "train_batching": args.train_batching,
               "final_loss": float(jnp.sum(jnp.asarray(box["loss"])))}
        if args.impl == "wavefront":
            # path_sum counts every traced segment, so this is the true
            # training-frame throughput (the lockstep's image-path stat
            # excludes learning-only respawns and is a lower bound).
            out["rays_per_sec"] = round(plen * total / dt, 1)
        else:
            out["image_rays_per_sec_lower_bound"] = round(plen * total / dt,
                                                          1)
        print(json.dumps(out), flush=True)
        params = box["params"]

    if not args.skip_pretrained:
        if args.impl == "wavefront":
            from rlrpt_tpu.deep.deep_wavefront import (
                render_frame_pretrained_wavefront)

            def run_inf(k):
                img, aux = render_frame_pretrained_wavefront(
                    k, scene, cam, params, cfg, rl, dl,
                    pix_mux=args.pix_mux, interpret=interp,
                    mlp_dtype=args.mlp_dtype)
                return jnp.sum(img), aux["avg_path_length"]
        else:
            from rlrpt_tpu.deep.pretrained import render_frame_pretrained

            def run_inf(k):
                img, aux = render_frame_pretrained(k, scene, cam, params,
                                                   cfg, rl, dl,
                                                   interpret=interp)
                return jnp.sum(img), aux["avg_path_length"]

        dt, plen = _measure(run_inf, key, args.frames)
        print(json.dumps({
            "which": f"neural_q_pretrained_{args.impl}",
            "sec_per_frame": round(dt, 4), "spp": args.spp,
            "size": args.size, "pix_mux": args.pix_mux,
            "mlp_dtype": args.mlp_dtype,
            "rays_per_sec": round(plen * total / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
