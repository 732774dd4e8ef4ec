"""Megakernel tuning sweep on the live backend.

Times render_default_mega over a grid of (r_tile, pix_mux, precision,
unroll) at the bench point (cornell 720x720, 1 spp, 80-bounce cap) and
reports rays/s per variant plus the MAPE of each variant's image against
the float32-HIGHEST render at the same seed.  NOTE: for variants that
change PRECISION this column is only a sanity indicator, not a bias
measurement — perturbed intersections reshuffle the in-kernel RNG stream,
so same-seed MAPE mostly measures MC noise (see
tools/precision_check.py, which measures estimator bias properly against
a high-spp ground truth).  It is a valid comparison only between variants
with identical tiling and precision.

Usage:  python -m rlrpt_tpu.tools.mega_sweep \
            [--variants r_tile,pix_mux,precision,unroll;...] [--repeats 8]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.utils.image import mape_score

# high3 (the production/bench mode since the fused compensated matmul)
# is the swept axis; one highest and one default row for reference.
DEFAULT_VARIANTS = (
    "1024,32,high3,2",
    "2048,32,high3,2",
    "512,32,high3,2",
    "1024,64,high3,2",
    "1024,32,high3,4",
    "1024,32,high3,1",
    "1024,32,highest,2",
    "1024,32,default,2",
)


def run_variant(scene, cam, cfg, key, r_tile, pix_mux, precision, unroll,
                repeats):
    from rlrpt_tpu.ops.megakernel import render_default_mega

    def render(k):
        return render_default_mega(k, scene, cam, cfg, r_tile=r_tile,
                                   pix_mux=pix_mux, precision=precision,
                                   unroll=unroll)

    for i in range(2):
        img, aux = render(jax.random.fold_in(key, 1000 + i))
    img0 = np.asarray(img)  # variant image at fold_in(key, 1001)
    # Lane utilisation: traced segments / (iterations x slot-lanes).
    import math
    n_slots = int(math.ceil(cfg.n_pixels / pix_mux / r_tile) * r_tile)
    segs = float(aux["avg_path_length"]) * cfg.n_pixels * cfg.samples_per_pixel
    util = segs / (float(aux["wavefront_iterations"]) * n_slots)

    best_rps = 0.0
    for trial in range(3):
        acc = jnp.float32(0.0)
        auxes = []
        t0 = time.perf_counter()
        for i in range(repeats):
            img, aux = render(jax.random.fold_in(key, trial * repeats + i))
            auxes.append(aux["avg_path_length"])
            acc = acc + jnp.sum(img)
        float(acc)
        dt = time.perf_counter() - t0
        rays = sum(float(a) for a in auxes) * cfg.n_pixels \
            * cfg.samples_per_pixel
        best_rps = max(best_rps, rays / dt)
    return best_rps, img0, util


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--variants", default=";".join(DEFAULT_VARIANTS))
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=80)
    args = ap.parse_args(argv)

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=1, max_ray_bounces=args.bounces)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    key = jax.random.PRNGKey(1984)

    ref_img = None
    for spec in args.variants.split(";"):
        rt, pm, prec, un = spec.split(",")
        rt, pm, un = int(rt), int(pm), int(un)
        try:
            rps, img, util = run_variant(scene, cam, cfg, key, rt, pm, prec,
                                         un, args.repeats)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(json.dumps({"variant": spec, "error": str(e)[:200]}))
            continue
        if ref_img is None and prec == "highest":
            ref_img = img
        # Meaningful only for variants sharing the first variant's tiling
        # (the in-kernel RNG keys on the tile-local iteration index).
        mape = (float(mape_score(ref_img * 255.0, img * 255.0))
                if ref_img is not None else None)
        print(json.dumps({
            "variant": spec,
            "rays_per_sec": round(rps, 1),
            "lane_util": round(util, 4),
            "mape_vs_f32": None if mape is None else round(mape, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
