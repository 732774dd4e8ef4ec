"""Scaling-efficiency benchmark: rays/sec at 1..N devices.

The BASELINE.json north-star asks for "rays/s efficiency measured at
1 chip, 1 host, and N>=2 hosts".  The reference has no distributed layer
to compare against (SURVEY §5.8) — this harness measures OUR data-parallel
layer's scaling: for each mesh size d in `sizes`, render the same frame
with `parallel.dp.render_default_dp` (rays sharded P('rays'), scene
replicated, zero collectives until image assembly) and report

    rays/s(d), speedup(d) = rays/s(d) / rays/s(1),
    efficiency(d) = speedup(d) / d.

Run on real hardware it measures chips; under
`XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu`
it validates the sharding path's scaling shape without a pod.  Multi-host
runs (jax.distributed) use the same entry point — the mesh just spans all
processes' devices.

Usage:  python -m rlrpt_tpu.tools.scaling_bench [--sizes 1,2,4,8]
        [--width 256] [--height 256] [--spp 4] [--bounces 20]
        [--scene cornell] [--repeats 3] [--json PATH]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.utils.profiling import host_fence


def _build_scene(name: str):
    if name == "cornell":
        from rlrpt_tpu.scene import cornell_box
        return cornell_box(), Camera.create([0.0, 0.0, -3.0])
    from rlrpt_tpu.scene import presets
    p = presets.get(name)
    return p.load(), Camera.create(p.camera_position)


def run_scaling(scene, camera, cfg: RenderConfig, sizes, repeats: int = 3,
                mode: str = "strong"):
    """Measure rays/s for each mesh size; returns a list of result dicts.

    mode "strong": fixed TOTAL work (the classic curve; on a virtual CPU
    mesh it confounds partition overhead with the host already using all
    cores for one device).  mode "weak": fixed PER-DEVICE work — the
    frame height scales with the mesh (height * d), so ideal scaling is
    FLAT per-device time and any rise isolates partition + collective +
    dispatch overhead from the multithreading confound (VERDICT r4
    weak #5).
    """
    import dataclasses as _dc

    from rlrpt_tpu.parallel.dp import render_default_dp
    from rlrpt_tpu.parallel.mesh import make_mesh

    results = []
    base_rps = None
    base_sec = None
    for d in sizes:
        if d > jax.device_count():
            # Skip (don't abort) so an unsorted --sizes list still measures
            # every size that fits, and truncation is visible (ADVICE r1).
            print(f"# skipping size {d}: only {jax.device_count()} devices")
            continue
        cfg_d = cfg if mode == "strong" else _dc.replace(
            cfg, height=cfg.height * d)
        mesh = make_mesh(d)
        key = jax.random.PRNGKey(1984)

        # Warm-up / compile.
        img, aux = render_default_dp(key, scene, camera, cfg_d, mesh=mesh)
        host_fence(img)

        best = float("inf")
        for r in range(repeats):
            t0 = time.perf_counter()
            img, aux = render_default_dp(jax.random.fold_in(key, r), scene,
                                         camera, cfg_d, mesh=mesh)
            host_fence(img)
            best = min(best, time.perf_counter() - t0)

        total_segments = (float(aux["avg_path_length"])
                          * cfg_d.n_pixels * cfg_d.samples_per_pixel)
        rps = total_segments / best
        if base_rps is None:
            base_rps, base_d, base_sec = rps, d, best
        row = {
            "mode": mode,
            "devices": d,
            "seconds": best,
            "rays_per_sec": rps,
            "rays_per_sec_per_device": rps / d,
        }
        if mode == "strong":
            speedup = rps / base_rps
            row["speedup"] = speedup
            row["efficiency"] = speedup / (d / base_d)
        else:
            # Ideal weak scaling keeps per-device time flat.
            row["pixels"] = cfg_d.n_pixels
            row["weak_efficiency"] = base_sec / best
        results.append(row)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sizes", default=None,
                    help="comma-separated mesh sizes (default 1,2,..,N pow2)")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=20)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mode", choices=("strong", "weak", "both"),
                    default="both")
    ap.add_argument("--json", default=None, help="also write results here")
    args = ap.parse_args(argv)

    n = jax.device_count()
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes, d = [], 1
        while d <= n:
            sizes.append(d)
            d *= 2

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces, ray_tile=4096)
    scene, camera = _build_scene(args.scene)
    modes = ["strong", "weak"] if args.mode == "both" else [args.mode]
    results = []
    for mode in modes:
        results += run_scaling(scene, camera, cfg, sizes,
                               repeats=args.repeats, mode=mode)
    for r in results:
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items()}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
