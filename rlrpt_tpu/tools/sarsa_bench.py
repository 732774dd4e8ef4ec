"""SARSA frame-time benchmark on the live backend.

The reference cites a +20% overhead for expected-SARSA over the default
tracer at equal SPP (4_critical_evaluation.tex:272, BASELINE.md).  This
harness measures OUR ratio at the bench point: steady-state seconds per
frame (and rays/s) for

  * the default megakernel (ops.megakernel — the bench.py fast path),
  * the regenerative SARSA wavefront (integrators.sarsa_wavefront),

on the cornell box at 720x720, 1 spp, 80-bounce cap, default volume
density (radiance_volumes_settings.h defaults).

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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=80)
    ap.add_argument("--area-per-sample", type=float, default=0.001)
    ap.add_argument("--pix-mux", type=int, default=1)
    ap.add_argument("--skip-mega", action="store_true")
    args = ap.parse_args(argv)

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    key = jax.random.PRNGKey(1984)
    total = cfg.n_pixels * cfg.samples_per_pixel

    if not args.skip_mega:
        from rlrpt_tpu.ops.megakernel import render_default_mega
        img, aux = render_default_mega(key, scene, cam, cfg, r_tile=1024,
                                       pix_mux=32)
        jnp.sum(img).block_until_ready()
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        paths = []
        for i in range(args.frames):
            img, aux = render_default_mega(jax.random.fold_in(key, i), scene,
                                           cam, cfg, r_tile=1024, pix_mux=32)
            paths.append(aux["avg_path_length"])
            acc = acc + jnp.sum(img)
        float(acc)
        dt = (time.perf_counter() - t0) / args.frames
        rays = sum(float(p) for p in paths) / args.frames * total
        print(json.dumps({"which": "default_mega", "sec_per_frame":
                          round(dt, 4), "rays_per_sec": round(rays / dt, 1)}),
              flush=True)
        mega_dt = dt
    else:
        mega_dt = None

    from rlrpt_tpu.integrators.sarsa_wavefront import (
        render_frame_sarsa_wavefront)
    from rlrpt_tpu.radiance.grid_bucket import build_volume_grid
    from rlrpt_tpu.radiance.volumes import build_radiance_volumes

    rl = RadianceVolumeConfig(area_per_sample=args.area_per_sample)
    vols = build_radiance_volumes(scene, rl)
    grid = build_volume_grid(vols)
    print(json.dumps({"n_volumes": int(vols.n_volumes),
                      "grid_cells": int(grid.payload.shape[0]),
                      "k_max": int(grid.k_max)}), flush=True)

    img, vols2, aux = render_frame_sarsa_wavefront(
        key, scene, cam, vols, grid, cfg, rl, pix_mux=args.pix_mux)
    jnp.sum(img).block_until_ready()

    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    paths = []
    v = vols
    for i in range(args.frames):
        img, v, aux = render_frame_sarsa_wavefront(
            jax.random.fold_in(key, i), scene, cam, v, grid, cfg, rl,
            pix_mux=args.pix_mux)
        paths.append(aux["avg_path_length"])
        acc = acc + jnp.sum(img)
    float(acc)
    dt = (time.perf_counter() - t0) / args.frames
    rays = sum(float(p) for p in paths) / args.frames * total
    out = {"which": "sarsa_wavefront", "sec_per_frame": round(dt, 4),
           "rays_per_sec": round(rays / dt, 1),
           "iters": int(aux["wavefront_iterations"])}
    if mega_dt:
        out["overhead_vs_default"] = round(dt / mega_dt, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
