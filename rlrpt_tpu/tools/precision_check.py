"""Accuracy check for megakernel matmul precisions.

Lower-precision MXU passes perturb intersection results, which reshuffles
the in-kernel RNG stream — so same-seed image comparison only measures MC
noise.  The valid test is ESTIMATOR accuracy: render many-spp images per
precision and compare each against a trusted float32 XLA render of the
same scene at equal-or-higher spp; an unbiased variant converges to the
same image, so its MAPE-vs-truth matches the f32 variant's.

Usage: python -m rlrpt_tpu.tools.precision_check [--spp 64] [--gt-spp 256]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.utils.image import mape_score, write_png


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--gt-spp", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--bounces", type=int, default=40)
    ap.add_argument("--precisions", default="highest,default")
    ap.add_argument("--out-prefix", default="/tmp/precis")
    args = ap.parse_args(argv)

    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    key = jax.random.PRNGKey(7)

    from rlrpt_tpu.integrators.wavefront import render_wavefront
    gt_cfg = RenderConfig(width=args.size, height=args.size,
                          samples_per_pixel=args.gt_spp,
                          max_ray_bounces=args.bounces)
    gt, _ = render_wavefront(jax.random.fold_in(key, 999), scene, cam, gt_cfg)
    gt = np.asarray(gt) * 255.0
    write_png(f"{args.out_prefix}_gt.png", gt / 255.0)

    from rlrpt_tpu.ops.megakernel import render_default_mega
    cfg = RenderConfig(width=args.size, height=args.size,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces)
    for prec in args.precisions.split(","):
        img, _ = render_default_mega(key, scene, cam, cfg, r_tile=1024,
                                     pix_mux=8, precision=prec)
        img = np.asarray(img) * 255.0
        write_png(f"{args.out_prefix}_{prec}.png", img / 255.0)
        print(json.dumps({
            "precision": prec,
            "mape_vs_f32_gt": round(float(mape_score(gt, img)), 4),
            "mean_abs_diff": round(float(np.mean(np.abs(gt - img))), 4),
            "mean_rel_bias": round(
                float(np.mean((img - gt)) / max(np.mean(gt), 1e-9)), 5),
        }), flush=True)


if __name__ == "__main__":
    main()
