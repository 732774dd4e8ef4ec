"""Render CLI — the runtime equivalent of the reference's main() dispatch.

The reference selects its render mode with the compile-time
PATH_TRACING_METHOD constant (0-5, image_settings.h:9-23) and hard-codes
scene/camera in main.cu:94-112; changing anything means recompiling.  Here
every knob is a flag:

    python -m rlrpt_tpu.tools.render --mode default --scene cornell \
        --width 256 --height 256 --spp 8 --out render.png

Modes (reference mapping):
  default       mode 0  (default_path_tracing.cu)
  sarsa         mode 1  (reinforcement_path_tracing.cu, learns while
                         rendering; --frames frames; saves Q-table with
                         --save-q)
  sarsa-fast    `sarsa` on the regenerative wavefront + grid-bucketed NN
                search (integrators/sarsa_wavefront.py); same learning
                rule, ~10x faster at default volume density
  sarsa-mega    the fully in-kernel RL pipeline: --frames learning frames
                on the binned (triangle x uv) Q-state inside one Pallas
                megakernel (ops/guided_mega_train.py, ~0.04 s/frame on a
                v5e), then a zero-gather guided inference render
                (ops/guided_mega.py)
  voronoi       mode 2  (voronoi_trace.cu)
  neural-q      mode 3  (neural_q_pathtracer.cu, online training)
  pretrained    mode 4  (pre_trained_pathtracer.cu; --model path)
  q-probe       mode 5  (q_value_extractor.cu; --probe/--out-probe)
  importance    CPU engine mode 1 (importance_sampling_path_tracing.cpp,
                         frozen precomputed map)
  precomputed   CPU engine mode 2 (precompute_irradiance_path_tracing.cpp)
  wavefront     `default` on the fast persistent-wavefront path
  mega          `default` on the single-pass Pallas TPU megakernel
                (the bench.py fast path; TPU only)
  distill       NN_Q_Value_Trainer (offline Q-table -> DQN)

--russian-roulette enables the optional unbiased RR termination
(config.RenderConfig) on the default/wavefront/sarsa paths.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import (DeepLearningConfig, RadianceVolumeConfig,
                              RenderConfig, TrainerConfig)
from rlrpt_tpu.scene import presets
from rlrpt_tpu.utils.image import write_bmp, write_png
from rlrpt_tpu.utils.stats import StatsLogger

MODES = ("default", "wavefront", "mega", "sarsa", "sarsa-fast",
         "sarsa-mega", "voronoi", "neural-q", "pretrained", "q-probe",
         "importance", "precomputed", "distill")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rlrpt-render", description=__doc__)
    p.add_argument("--mode", choices=MODES, default="default")
    p.add_argument("--scene", default="cornell",
                   help=f"preset name ({', '.join(presets.PRESETS)})")
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--spp", type=int, default=32)
    p.add_argument("--bounces", type=int, default=80)
    p.add_argument("--frames", type=int, default=1,
                   help="learning frames for sarsa/neural-q")
    p.add_argument("--seed", type=int, default=1984)
    p.add_argument("--out", default="render.png", help=".png or .bmp")
    p.add_argument("--grid-resolution", type=int, default=12)
    p.add_argument("--area-per-sample", type=float, default=0.001)
    p.add_argument("--stats", default=None, help="training stats file")
    p.add_argument("--save-q", default=None, help="save Q-table text file")
    p.add_argument("--load-q", default=None, help="load Q-table text file")
    p.add_argument("--model", default=None, help="DyNet-format model path")
    p.add_argument("--save-model", default=None)
    p.add_argument("--probe", default=None, help="to_select.txt path")
    p.add_argument("--out-probe", default="selected_deep.txt")
    p.add_argument("--vertices", default=None,
                   help="vertices.txt (distill mode)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--precompute-spp", type=int, default=16)
    p.add_argument("--pix-mux", type=int, default=4,
                   help="pixels per wavefront slot (sarsa-fast)")
    p.add_argument("--impl", choices=("wavefront", "lockstep"),
                   default="wavefront",
                   help="pretrained/neural-q schedule: the regenerative "
                        "slot wavefront (production, deep/deep_wavefront) "
                        "or the reference-shaped lockstep")
    p.add_argument("--mlp-dtype", choices=("f32", "bf16"), default="f32",
                   help="pretrained-wavefront Q-forward precision")
    p.add_argument("--russian-roulette", action="store_true")
    p.add_argument("--rr-start-bounce", type=int, default=3)
    p.add_argument("--rr-min-prob", type=float, default=0.05)
    return p


def _save(img, path):
    img = np.asarray(img)
    if path.lower().endswith(".bmp"):
        write_bmp(path, img)
    else:
        write_png(path, img)
    print(f"saved {path}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    key = jax.random.PRNGKey(args.seed)
    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces,
                       russian_roulette=args.russian_roulette,
                       rr_start_bounce=args.rr_start_bounce,
                       rr_min_prob=args.rr_min_prob)
    rl = RadianceVolumeConfig(grid_resolution=args.grid_resolution,
                              area_per_sample=args.area_per_sample)
    dl = DeepLearningConfig()

    if args.mode == "distill":
        from rlrpt_tpu.deep.distill import distill
        from rlrpt_tpu.nn.dynet_io import save_dynet_model
        assert args.load_q and args.vertices, \
            "distill needs --load-q and --vertices"
        params, history = distill(args.load_q, args.vertices,
                                  TrainerConfig(epochs=args.epochs),
                                  seed=args.seed, verbose=True)
        if args.save_model:
            save_dynet_model(params, args.save_model)
            print(f"saved {args.save_model}")
        return 0

    # Pallas kernels must run interpreted on the CPU backend.
    interp = jax.default_backend() == "cpu"
    preset = presets.get(args.scene)
    scene = preset.load()
    camera = Camera.create(preset.camera_position)
    t0 = time.time()

    if args.mode in ("default", "wavefront", "mega"):
        if args.mode == "mega":
            from rlrpt_tpu.ops.megakernel import render_default_mega
            img, aux = render_default_mega(key, scene, camera, cfg,
                                           interpret=interp)
        elif args.mode == "wavefront":
            from rlrpt_tpu.integrators.wavefront import render_wavefront
            img, aux = render_wavefront(key, scene, camera, cfg,
                                        interpret=interp)
        else:
            from rlrpt_tpu.integrators.default_tracer import render_default
            img, aux = render_default(key, scene, camera, cfg)
        print(f"render time {time.time() - t0:.1f}s  "
              f"avg_path_length {float(aux['avg_path_length']):.2f}")
        _save(img, args.out)
        return 0

    if args.mode == "sarsa-mega":
        # Fully in-kernel RL pipeline: train the binned Q-state on the MXU
        # for --frames frames (ops.guided_mega_train), then render --spp
        # with the zero-gather guided megakernel (ops.guided_mega).
        from rlrpt_tpu.ops.guided_mega import render_guided_mega
        from rlrpt_tpu.ops.guided_mega_train import (
            init_bin_q, rebuild_bin_cdf, render_sarsa_mega_train)
        from rlrpt_tpu.ops.megakernel import mt_tables

        rl_k = rl if rl.grid_resolution != 12 else             __import__("dataclasses").replace(rl, grid_resolution=11)
        gr, ub = rl_k.grid_resolution, 4
        t_pad = mt_tables(scene.to_device())[0].shape[0] // 4
        q, vis = init_bin_q(t_pad, ub, gr, rl_k.initial_radiance)
        tb = rebuild_bin_cdf(q, gr, ub, t_pad,
                             defensive_mix=rl_k.defensive_mix)
        sc = scene.to_device()
        stats = StatsLogger(args.stats) if args.stats else None
        for fr in range(args.frames):
            img, q, vis, aux = render_sarsa_mega_train(
                jax.random.fold_in(key, fr), sc, camera, tb, q, vis, cfg,
                rl_k.radiance_threshold, interpret=interp)
            tb = rebuild_bin_cdf(q, gr, ub, t_pad,
                                 defensive_mix=rl_k.defensive_mix)
            print(f"frame {fr}: avg_path "
                  f"{float(aux['avg_path_length']):.2f}  td_scatters "
                  f"{int(aux['td_scatter_count'])}")
            if stats:
                stats.append(float(aux["avg_path_length"]), 0.0, 0)
        img, aux = render_guided_mega(jax.random.fold_in(key, 10_000), sc,
                                      camera, tb, cfg, interpret=interp)
        print(f"total time {time.time() - t0:.1f}s  inference avg_path "
              f"{float(aux['avg_path_length']):.2f}")
        _save(img, args.out)
        return 0

    if args.mode == "voronoi":
        from rlrpt_tpu.integrators.voronoi import (render_voronoi,
                                                   voronoi_colours)
        from rlrpt_tpu.radiance.volumes import build_radiance_volumes
        vols = build_radiance_volumes(scene, rl)
        cols = voronoi_colours(key, vols.n_volumes)
        img = render_voronoi(key, scene, camera, vols, cols, cfg)
        _save(img, args.out)
        return 0

    if args.mode in ("sarsa", "sarsa-fast", "importance", "precomputed"):
        from rlrpt_tpu.radiance import map_io
        from rlrpt_tpu.radiance.volumes import build_radiance_volumes
        vols = build_radiance_volumes(scene, rl)
        if args.load_q:
            pos, q, _ = map_io.load_radiance_map_data(args.load_q)
            import dataclasses
            import jax.numpy as jnp
            from rlrpt_tpu.radiance.volumes import rebuild_cdf
            vols = rebuild_cdf(dataclasses.replace(vols, q=jnp.asarray(q)))

        if args.mode in ("sarsa", "sarsa-fast"):
            if args.mode == "sarsa-fast":
                from rlrpt_tpu.integrators.sarsa_wavefront import \
                    render_frame_sarsa_wavefront
                from rlrpt_tpu.radiance.grid_bucket import \
                    build_volume_class_table
                grid = build_volume_class_table(vols, scene)

                def frame(k, vols):
                    return render_frame_sarsa_wavefront(
                        k, scene, camera, vols, grid, cfg, rl,
                        pix_mux=args.pix_mux, interpret=interp)
            else:
                from rlrpt_tpu.integrators.reinforcement_tracer import \
                    render_frame_sarsa

                def frame(k, vols):
                    return render_frame_sarsa(k, scene, camera, vols, cfg, rl)
            stats = StatsLogger(args.stats) if args.stats else None
            for fr in range(args.frames):
                img, vols, aux = frame(jax.random.fold_in(key, fr), vols)
                print(f"frame {fr}: avg_path "
                      f"{float(aux['avg_path_length']):.2f}  zclp "
                      f"{int(aux['zero_contribution_light_paths'])}")
                if stats:
                    stats.append(float(aux["avg_path_length"]), 0.0,
                                 int(aux["zero_contribution_light_paths"]))
            if args.save_q:
                map_io.save_q_vals_to_file(vols, args.save_q)
                print(f"saved {args.save_q}")
        elif args.mode == "importance":
            from rlrpt_tpu.integrators.precompute import (
                precompute_radiance_grids, render_importance_sampled)
            if not args.load_q:
                vols = precompute_radiance_grids(key, scene, vols, cfg,
                                                 spp=args.precompute_spp)
            img, _ = render_importance_sampled(key, scene, camera, vols, cfg,
                                               rl)
        else:
            from rlrpt_tpu.integrators.precompute import (
                precompute_radiance_grids, render_precomputed_irradiance)
            if not args.load_q:
                vols = precompute_radiance_grids(key, scene, vols, cfg,
                                                 spp=args.precompute_spp)
            img = render_precomputed_irradiance(key, scene, camera, vols, cfg)
        print(f"render time {time.time() - t0:.1f}s")
        _save(img, args.out)
        return 0

    # neural modes
    from rlrpt_tpu.deep.neural_q import init_neural_q
    from rlrpt_tpu.nn.dynet_io import load_dynet_model, save_dynet_model
    if args.model:
        params = load_dynet_model(args.model)
        opt_state = None
    else:
        params, opt_state = init_neural_q(key, scene, dl, rl.grid_resolution)

    if args.mode == "pretrained":
        if args.impl == "wavefront":
            from rlrpt_tpu.deep.deep_wavefront import (
                render_frame_pretrained_wavefront)
            img, aux = render_frame_pretrained_wavefront(
                key, scene, camera, params, cfg, rl, dl,
                pix_mux=args.pix_mux, interpret=interp,
                mlp_dtype=args.mlp_dtype)
        else:
            from rlrpt_tpu.deep.pretrained import render_frame_pretrained
            img, aux = render_frame_pretrained(key, scene, camera, params,
                                               cfg, rl, dl)
        print(f"render time {time.time() - t0:.1f}s  avg_path "
              f"{float(aux['avg_path_length']):.2f}")
        _save(img, args.out)
        return 0

    if args.mode == "q-probe":
        from rlrpt_tpu.deep.q_probe import save_selected_q_values_nn
        assert args.probe, "q-probe needs --probe to_select.txt"
        save_selected_q_values_nn(params, scene, args.probe, args.out_probe)
        print(f"saved {args.out_probe}")
        return 0

    # neural-q online training
    if opt_state is None:
        from rlrpt_tpu.deep.neural_q import default_optimizer
        opt_state = default_optimizer(dl).init(params)
    if args.impl == "wavefront":
        from rlrpt_tpu.deep.deep_wavefront import (
            render_frame_neural_q_wavefront as _nq_frame)
        nq_kwargs = dict(pix_mux=args.pix_mux, interpret=interp)
    else:
        from rlrpt_tpu.deep.neural_q import render_frame_neural_q as _nq_frame
        nq_kwargs = {}
    eps = dl.epsilon_start
    stats = StatsLogger(args.stats) if args.stats else None
    for fr in range(args.frames):
        img, params, opt_state, eps, aux = _nq_frame(
            jax.random.fold_in(key, fr), scene, camera, params, opt_state,
            eps, cfg, rl, dl, **nq_kwargs)
        loss = float(np.asarray(aux["loss"]).sum())
        print(f"frame {fr}: loss {loss:.1f}  avg_path "
              f"{float(np.asarray(aux['avg_path_length']).reshape(-1)[-1]):.2f}"
              f"  epsilon {float(eps):.3f}")
        if stats:
            # Lockstep reports per-spp arrays (one stats line each, the
            # reference protocol); the wavefront reports frame totals
            # (one line per frame — use tools.nn_training_stats for
            # per-spp lines at wavefront speed).
            a = np.asarray(aux["avg_path_length"]).reshape(-1)
            l = np.asarray(aux["loss"]).reshape(-1)
            z = np.asarray(aux["zero_contribution_light_paths"]).reshape(-1)
            for i in range(len(l)):
                stats.append(float(a[i]), float(l[i]), int(z[i]))
        if args.save_model:
            save_dynet_model(params, args.save_model)
    _save(img, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
