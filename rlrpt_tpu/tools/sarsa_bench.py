"""SARSA frame-time benchmark on the live backend.

The reference cites a +20% overhead for expected-SARSA over the default
tracer at equal SPP (4_critical_evaluation.tex:272, BASELINE.md).  This
harness measures OUR ratio at the bench point: steady-state seconds per
frame (and rays/s) for

  * the default XLA wavefront (integrators.wavefront) — the
    apples-to-apples baseline: the SARSA tracer is the same wavefront
    machinery plus the RL additions (volume search, TD scatters, CDF
    sampling), exactly how the reference's +20% compares its two kernels,
  * the default megakernel (ops.megakernel — the bench.py fast path,
    reported for reference),
  * the regenerative SARSA wavefront (integrators.sarsa_wavefront),

on the cornell box at 720x720, 1 spp, 80-bounce cap, default volume
density (radiance_volumes_settings.h defaults).

Timing protocol (shared `measure`): 3 warm-up executions after compile
(first dispatches over the axon tunnel are slow), then `trials` trials of
`frames` chained executions fenced by ONE host materialisation, best
trial reported.  block_until_ready is not a reliable fence over the
tunnel — see utils.profiling.host_fence.

Usage: python -m rlrpt_tpu.tools.sarsa_bench [--spp 1] [--frames 6]
       [--area-per-sample 0.001] [--pix-mux 1]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.scene import cornell_box


def measure(fn, key, frames: int, trials: int = 2):
    """Steady-state sec/frame for `fn(key) -> (probe_scalar, path_len)`.

    Warm-up: compile + 3 executions, fenced.  Then `trials` trials of
    `frames` chained executions each; ONE host fetch per trial; returns
    (best sec/frame, mean path length of the last trial).
    """
    acc = jnp.float32(0.0)
    for i in range(3):
        probe, _ = fn(jax.random.fold_in(key, 900 + i))
        acc = acc + probe
    float(acc)

    # Keep (sec/frame, mean path length) PAIRED per trial so the reported
    # rays/s mixes timing and path stats from the same trial (ADVICE r3).
    best = (float("inf"), 0.0)
    for t in range(trials):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        paths = []
        for i in range(frames):
            probe, plen = fn(jax.random.fold_in(key, 100 * t + i))
            paths.append(plen)
            acc = acc + probe
        float(acc)
        dt = (time.perf_counter() - t0) / frames
        if dt < best[0]:
            best = (dt, sum(float(p) for p in paths) / len(paths))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=80)
    ap.add_argument("--area-per-sample", type=float, default=0.001)
    # Swept on a v5e at the bench point (spp=1): 8 beat 1 (0.550 vs
    # 0.635 s/frame) and 32 (0.752 — too many narrow iterations).
    ap.add_argument("--pix-mux", type=int, default=8)
    ap.add_argument("--skip-mega", action="store_true")
    ap.add_argument("--skip-wavefront", action="store_true")
    ap.add_argument("--search", choices=("table", "grid"), default="table",
                    help="volume search: precomputed class-answer table "
                         "(fast) or bucketed candidate grid")
    ap.add_argument("--drain-factor", type=int, default=4)
    ap.add_argument("--min-drain-w", type=int, default=512)
    ap.add_argument("--cdf-dtype", choices=("f32", "bf16"), default="f32")
    args = ap.parse_args(argv)

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    key = jax.random.PRNGKey(1984)
    total = cfg.n_pixels * cfg.samples_per_pixel

    wf_dt = None
    if not args.skip_wavefront:
        from rlrpt_tpu.integrators.wavefront import render_wavefront

        def run_wf(k):
            img, aux = render_wavefront(k, scene, cam, cfg)
            return jnp.sum(img), aux["avg_path_length"]

        wf_dt, plen = measure(run_wf, key, args.frames)
        print(json.dumps({
            "which": "default_wavefront", "sec_per_frame": round(wf_dt, 4),
            "rays_per_sec": round(plen * total / wf_dt, 1)}), flush=True)

    if not args.skip_mega:
        from rlrpt_tpu.ops.megakernel import render_default_mega

        def run_mega(k):
            img, aux = render_default_mega(k, scene, cam, cfg,
                                           r_tile=1024, pix_mux=32)
            return jnp.sum(img), aux["avg_path_length"]

        mega_dt, plen = measure(run_mega, key, args.frames)
        print(json.dumps({
            "which": "default_mega", "sec_per_frame": round(mega_dt, 4),
            "rays_per_sec": round(plen * total / mega_dt, 1)}), flush=True)

    from rlrpt_tpu.integrators.sarsa_wavefront import (
        render_frame_sarsa_wavefront)
    from rlrpt_tpu.radiance.grid_bucket import build_volume_grid
    from rlrpt_tpu.radiance.volumes import build_radiance_volumes

    rl = RadianceVolumeConfig(area_per_sample=args.area_per_sample)
    vols = build_radiance_volumes(scene, rl)
    if args.search == "table":
        from rlrpt_tpu.radiance.grid_bucket import build_volume_class_table
        grid = build_volume_class_table(vols, scene)
        print(json.dumps({"n_volumes": int(vols.n_volumes),
                          "search": "table",
                          "cells": int(grid.table.shape[0]),
                          "table_mb": round(grid.nbytes / 2**20, 1)}),
              flush=True)
    else:
        grid = build_volume_grid(vols)
        print(json.dumps({"n_volumes": int(vols.n_volumes),
                          "search": "grid",
                          "grid_cells": int(grid.payload.shape[0]),
                          "k_max": int(grid.k_max)}), flush=True)

    # NOTE: learning mutates the Q-table, but frame cost does not depend on
    # the Q values (static shapes, fixed iteration structure), so rendering
    # each timed frame from the same initial `vols` is a fair steady-state
    # measurement and keeps `measure` trials independent.
    last_aux = {}

    def run_sarsa(k):
        img, _, aux = render_frame_sarsa_wavefront(
            k, scene, cam, vols, grid, cfg, rl, pix_mux=args.pix_mux,
            drain_factor=args.drain_factor, min_drain_w=args.min_drain_w,
            cdf_dtype=args.cdf_dtype)
        last_aux["iters"] = aux["wavefront_iterations"]
        last_aux["phase_iters"] = aux["phase_iterations"]
        last_aux["phase_widths"] = aux["phase_widths"]
        return jnp.sum(img), aux["avg_path_length"]

    dt, plen = measure(run_sarsa, key, args.frames)
    out = {"which": "sarsa_wavefront", "sec_per_frame": round(dt, 4),
           "rays_per_sec": round(plen * total / dt, 1),
           "iters": int(last_aux["iters"]),
           "pix_mux": args.pix_mux, "cdf_dtype": args.cdf_dtype,
           "phase_widths": [int(w) for w in last_aux["phase_widths"]],
           "phase_iters": [int(x) for x in last_aux["phase_iters"]]}
    if wf_dt:
        out["overhead_vs_default_wavefront"] = round(dt / wf_dt - 1.0, 3)
    print(json.dumps(out), flush=True)

    # ---- in-kernel binned-SARSA learning megakernel ----------------------
    # The fully fused learning frame (ops.guided_mega_train): the whole TD
    # loop runs on the MXU against the (triangle x uv-bin) Q-state; the
    # per-frame CDF rebuild (reference schedule) is timed inside the frame.
    from rlrpt_tpu.ops.guided_mega import render_guided_mega
    from rlrpt_tpu.ops.guided_mega_train import (init_bin_q, rebuild_bin_cdf,
                                                 render_sarsa_mega_train)
    from rlrpt_tpu.ops.megakernel import mt_tables

    gr, ub = 11, 4
    rl_k = RadianceVolumeConfig(grid_resolution=gr)
    t_pad = mt_tables(scene.to_device())[0].shape[0] // 4
    q0, v0 = init_bin_q(t_pad, ub, gr, rl_k.initial_radiance)
    tb0 = rebuild_bin_cdf(q0, gr, ub, t_pad)
    sc_dev = scene.to_device()

    def run_train(k):
        img, q1, v1, aux = render_sarsa_mega_train(
            k, sc_dev, cam, tb0, q0, v0, cfg, rl_k.radiance_threshold,
            r_tile=1024, pix_mux=32)
        tb1 = rebuild_bin_cdf(q1, gr, ub, t_pad)
        last_aux["train_iters"] = aux["wavefront_iterations"]
        return jnp.sum(img) + jnp.sum(tb1.cdf.astype(jnp.float32)) * 0.0, \
            aux["avg_path_length"]

    tdt, tplen = measure(run_train, key, args.frames)
    print(json.dumps({
        "which": "sarsa_mega_train", "sec_per_frame": round(tdt, 4),
        "rays_per_sec": round(tplen * total / tdt, 1),
        "iters": int(last_aux["train_iters"]),
        "uv_bins": ub, "sector_grid": gr,
        "state_space": f"{t_pad * ub * ub} bins x {gr * gr} sectors",
        "overhead_vs_default_mega":
            round(tdt / mega_dt - 1.0, 3) if not args.skip_mega else None,
        "speedup_vs_xla_sarsa_wavefront": round(dt / tdt, 2)}), flush=True)

    def run_infer(k):
        img, aux = render_guided_mega(k, sc_dev, cam, tb0, cfg,
                                      r_tile=1024, pix_mux=32)
        return jnp.sum(img), aux["avg_path_length"]

    idt, iplen = measure(run_infer, key, args.frames)
    print(json.dumps({
        "which": "sarsa_guided_infer", "sec_per_frame": round(idt, 4),
        "rays_per_sec": round(iplen * total / idt, 1),
        "overhead_vs_default_mega":
            round(idt / mega_dt - 1.0, 3) if not args.skip_mega else None}),
        flush=True)


if __name__ == "__main__":
    main()
