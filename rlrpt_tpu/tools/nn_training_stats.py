"""Record the reference's neural-Q training-stats protocol.

The reference appends one `avg_path_length loss zero_contribution_paths`
line per spp sample while training (neural_q_pathtracer.cu:577-583 ->
Radiance_Map_Data/nn_training_stats.txt; its shipped trajectory is
loss 1.30e12 -> 1.03e12, path length 29.5 -> 26.0, ZCLP 270726 -> 193502
over the first 3 epochs — BASELINE.md).  This harness reproduces that
artifact for OUR trainer: N frames x S spp of online neural-Q training
on a scene, one stats line per spp sample, plus the training-curve plots
(tools.training_curves, the Graphing/training_curve_generator.py port).

Per-spp granularity comes from driving the regenerative wavefront trainer
(deep.deep_wavefront) in 1-spp chunks — each chunk is exactly one spp
sample's budget, so its aggregate stats ARE the per-sample line; pass
--impl lockstep for the bounce-synchronous schedule (deep.neural_q
reports true per-spp arrays, much slower).

Usage: python -m rlrpt_tpu.tools.nn_training_stats [--frames 8] [--spp 8]
       [--size 720] [--scene cornell] [--out nn_training_stats.txt]
       [--plot] [--json PATH]
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
from rlrpt_tpu.scene import cornell_box, presets
from rlrpt_tpu.utils.profiling import host_fence
from rlrpt_tpu.utils.stats import StatsLogger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--size", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=80)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--impl", choices=("wavefront", "lockstep"),
                    default="wavefront")
    ap.add_argument("--pix-mux", type=int, default=8)
    ap.add_argument("--out", default="nn_training_stats.txt")
    ap.add_argument("--eps-start", type=float, default=None,
                    help="initial epsilon; default = the reference's "
                         "EPSILON_START 0.05 (deep_learning_settings.h:5 — "
                         "with EPSILON_MIN also 0.05 the reference runs "
                         "CONSTANT eps 0.05; the r4 artifact used 1.0, an "
                         "anneal the reference never runs, which conflated "
                         "the explore->greedy shift with learning progress)")
    ap.add_argument("--plot", action="store_true",
                    help="also render the three training-curve PNGs")
    ap.add_argument("--json", default=None,
                    help="write a summary JSON (first/last rows, timing)")
    args = ap.parse_args(argv)

    interp = jax.default_backend() == "cpu"
    if args.scene == "cornell":
        scene, cam = cornell_box(), Camera.create([0.0, 0.0, -3.0])
    else:
        p = presets.get(args.scene)
        scene, cam = p.load(), Camera.create(p.camera_position)

    rl = RadianceVolumeConfig()
    dl = DeepLearningConfig()
    from rlrpt_tpu.deep.neural_q import init_neural_q
    key = jax.random.PRNGKey(1984)
    params, opt_state = init_neural_q(jax.random.fold_in(key, 7), scene, dl,
                                      rl.grid_resolution)
    log = StatsLogger(args.out, reset=True)
    eps = dl.epsilon_start if args.eps_start is None else args.eps_start
    t0 = time.perf_counter()
    rows = []
    extras = []  # per-sample [loss_rel, light_hit_fraction, avg_light_len]

    if args.impl == "wavefront":
        from rlrpt_tpu.deep.deep_wavefront import (
            render_frame_neural_q_wavefront)
        cfg1 = RenderConfig(width=args.size, height=args.size,
                            samples_per_pixel=1,
                            max_ray_bounces=args.bounces)
        for f in range(args.frames):
            for s in range(args.spp):
                # One 1-spp chunk == one spp sample of the reference's
                # loop; epsilon decays once per chunk like the
                # reference's per-sample decay (the chunk call advances
                # it by spp=1 decays).
                _, params, opt_state, eps, aux = \
                    render_frame_neural_q_wavefront(
                        jax.random.fold_in(key, 100 + f * args.spp + s),
                        scene, cam, params, opt_state, eps, cfg1, rl, dl,
                        pix_mux=args.pix_mux, interpret=interp)
                host_fence(aux["loss"])
                row = (float(aux["avg_path_length"]), float(aux["loss"]),
                       int(aux["zero_contribution_light_paths"]))
                log.append(*row)
                rows.append(row)
                extras.append((float(aux["loss_rel"]),
                               float(aux["light_hit_fraction"]),
                               float(aux["avg_light_path_length"])))
    else:
        from rlrpt_tpu.deep.neural_q import render_frame_neural_q
        cfg = RenderConfig(width=args.size, height=args.size,
                           samples_per_pixel=args.spp,
                           max_ray_bounces=args.bounces)
        for f in range(args.frames):
            _, params, opt_state, eps, aux = render_frame_neural_q(
                jax.random.fold_in(key, 100 + f), scene, cam, params,
                opt_state, eps, cfg, rl, dl, interpret=interp)
            host_fence(aux["loss"])
            for s in range(args.spp):
                row = (float(aux["avg_path_length"][s]),
                       float(aux["loss"][s]),
                       int(aux["zero_contribution_light_paths"][s]))
                log.append(*row)
                rows.append(row)
    train_sec = time.perf_counter() - t0

    outputs = [args.out]
    if args.plot:
        from rlrpt_tpu.tools.training_curves import plot_stats
        outputs += plot_stats(args.out)

    summary = {
        "protocol": ("per-spp avg_path_length loss zclp "
                     "(neural_q_pathtracer.cu:577-583)"),
        "impl": args.impl, "scene": args.scene, "size": args.size,
        "frames": args.frames, "spp": args.spp,
        "eps_start": eps if not rows else (
            dl.epsilon_start if args.eps_start is None else args.eps_start),
        "train_sec": round(train_sec, 2),
        "first": rows[0], "last": rows[-1],
        "loss_first_frame": sum(r[1] for r in rows[:args.spp]),
        "loss_last_frame": sum(r[1] for r in rows[-args.spp:]),
        "zclp_first": rows[0][2], "zclp_last": rows[-1][2],
        "files": outputs,
    }
    if extras:
        # Scale-free diagnostics (wavefront impl): absolute loss tracks the
        # growing Q^2 magnitude (x200 light reward); loss_rel = loss/sum(td^2)
        # is the convergence curve, and the light-terminated subset is where
        # "guidance finds lights sooner" is observable (the all-paths average
        # RISES on open scenes as guidance converts escapes into light hits).
        summary["loss_rel_first_frame"] = (
            sum(e[0] for e in extras[:args.spp]) / args.spp)
        summary["loss_rel_last_frame"] = (
            sum(e[0] for e in extras[-args.spp:]) / args.spp)
        summary["light_hit_fraction_first"] = extras[0][1]
        summary["light_hit_fraction_last"] = extras[-1][1]
        summary["avg_light_path_first"] = extras[0][2]
        summary["avg_light_path_last"] = extras[-1][2]
        summary["per_sample_extras"] = [
            {"loss_rel": round(e[0], 6), "light_hit_fraction": round(e[1], 6),
             "avg_light_path_length": round(e[2], 3)} for e in extras]
    print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
