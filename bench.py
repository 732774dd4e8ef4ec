"""Benchmark: rays/sec/chip, Cornell default path trace @ 1 spp.

The BASELINE.json north-star metric.  Renders the hard-coded Cornell box at
the reference's default 720x720 (image_settings.h:9-10) with the full
80-bounce cap (monte_carlo_settings.h:8), 1 spp, on whatever backend is
live (the real TPU chip under the driver).  "Rays" counts traced path
segments (one closest-hit sweep per segment), measured from the per-pixel
path lengths the renderer reports.

vs_baseline: the thesis publishes no throughput number for the reference
GPU engine; BASELINE.json's `published` is empty.  We normalise against an
order-of-magnitude estimate of the reference default tracer on its GTX
1070Ti — 1.0e8 rays/s (brute-force 114-triangle sweep, divergent 80-deep
bounce loops, global-memory bound; the thesis only reports relative
overheads, 4_critical_evaluation.tex:272) — so vs_baseline > 1 means faster
than the estimated reference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax

# Remote TPU compiles over the tunnel take minutes; cache them on disk so
# repeated bench runs (and the driver's) skip recompilation.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.scene import cornell_box

REFERENCE_RAYS_PER_SEC_ESTIMATE = 1.0e8

# Megakernel tuning for the 720x720/114-triangle bench point: 1024/32 —
# re-confirmed after the fused single-pass kernel (bench-protocol runs:
# 1024/32 462M vs 2048/32 433M rays/s; the sweep's shorter-rep protocol
# ranked them the other way, trust the bench protocol for the bench).
R_TILE = 1024
PIX_MUX = 32
# Intersection precision: compensated-bf16 ("high3"), fused into a SINGLE
# MXU pass ([Gh|Gh|Gl] @ [fh;fl;fh], K=48 zero-pads to the MXU's 128
# contraction lanes just like K=16) — vs 6 passes for the HIGHEST
# emulation, with estimator bias at the MC noise floor
# (tools/precision_check.py; the kernel is MXU-pass-bound).
PRECISION = "high3"


def main():
    from rlrpt_tpu.ops.megakernel import render_default_mega

    cfg = RenderConfig(width=720, height=720, samples_per_pixel=1,
                       max_ray_bounces=80)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    key = jax.random.PRNGKey(1984)

    def render(k):
        return render_default_mega(k, scene, cam, cfg,
                                   r_tile=R_TILE, pix_mux=PIX_MUX,
                                   precision=PRECISION)

    # Warm-up: compile + a few executions (the tunnelled chip's first
    # dispatches after process start are slow; time only the steady state).
    # NOTE: over the axon tunnel, block_until_ready() on a queued dispatch
    # can return before execution finishes — the only reliable fence is a
    # host materialisation.  We chain every rep into one device scalar and
    # fetch it once, so a trial costs N kernels + a single round-trip.
    for i in range(3):
        img, aux = render(jax.random.fold_in(key, 1000 + i))
    float(jax.numpy.sum(img))

    # Per-trial throughputs go to stderr (the driver contract is ONE json
    # line on stdout); the reported value is the MEDIAN of 5 trials — the
    # round-3 best-of-3 protocol showed >10% spread over the tunnel
    # (README said 478M, the driver run 426M), and the median is the
    # number a user actually reproduces.
    import statistics
    import sys

    trials = []
    for trial in range(5):
        reps = 10
        auxes = []
        acc = jax.numpy.float32(0.0)
        t0 = time.perf_counter()
        for i in range(reps):
            img, aux = render(jax.random.fold_in(key, trial * reps + i))
            auxes.append(aux["avg_path_length"])
            acc = acc + jax.numpy.sum(img)
        float(acc)  # fence: forces every chained kernel
        dt = time.perf_counter() - t0
        rays_total = sum(float(a) for a in auxes) * cfg.n_pixels \
            * cfg.samples_per_pixel
        trials.append(rays_total / dt)
        print(f"trial {trial}: {trials[-1] / 1e6:.1f}M rays/s",
              file=sys.stderr, flush=True)
    rays_per_sec = statistics.median(trials)
    print(f"median {rays_per_sec / 1e6:.1f}M  best {max(trials) / 1e6:.1f}M"
          f"  spread {(max(trials) / min(trials) - 1) * 100:.1f}%",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "rays/sec/chip (cornell 720x720, 1 spp, 80-bounce cap)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE, 4),
    }))


if __name__ == "__main__":
    main()
