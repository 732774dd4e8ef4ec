"""Large-scene throughput bench (VERDICT r3 item 4).

Every recorded perf number through round 3 was the 38-triangle cornell
box; the megakernel's MXU sweep is O(T) per path segment, so triangle-
heavy scenes (bunny.obj: 4968, Medieval_House.obj: 1370) pay ~T/114 of
the cornell sweep cost per segment.  The reference's hot loop is equally
brute-force O(T) (GPU_Rendering_Engine/Source/rays/ray.cu:17-36), so
relative parity holds by construction — this harness records the
ABSOLUTE rays/s per scene so the claim is measured, not argued.

Emits one JSON line per scene: triangles, steady-state sec/frame,
rays/s, plus the per-segment sweep cost normalised by triangle count
(rays*tris/s — flat across scenes when the sweep dominates).

Usage: python -m rlrpt_tpu.tools.scene_bench [--scenes bunny,...]
       [--spp 1] [--size 720] [--frames 3] [--r-tile 1024] [--pix-mux 32]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.scene import cornell_box, presets


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="cornell,medieval_house,bunny")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--size", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=80)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--r-tile", type=int, default=1024)
    ap.add_argument("--pix-mux", type=int, default=32)
    ap.add_argument("--morton", action="store_true", default=True,
                    help="Morton-sort surfaces so chunks are spatially "
                         "tight (scene.morton_sort_surfaces); estimator "
                         "unchanged")
    ap.add_argument("--no-morton", dest="morton", action="store_false")
    ap.add_argument("--cull", choices=("on", "off", "both"), default="both",
                    help="AABB chunk pre-reject (multi-chunk scenes only; "
                         "'both' records an on/off row pair per scene)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from rlrpt_tpu.ops.megakernel import render_default_mega
    interp = jax.default_backend() == "cpu"
    cfg = RenderConfig(width=args.size, height=args.size,
                       samples_per_pixel=args.spp,
                       max_ray_bounces=args.bounces)
    key = jax.random.PRNGKey(1984)
    rows = []
    for name in args.scenes.split(","):
        if name == "cornell":
            scene, cam = cornell_box(), Camera.create([0.0, 0.0, -3.0])
        else:
            p = presets.get(name)
            scene, cam = p.load(), Camera.create(p.camera_position)
        if args.morton:
            from rlrpt_tpu.scene.scene import morton_sort_surfaces
            scene = morton_sort_surfaces(scene)
        n_tris = int(scene.v0.shape[0])
        from rlrpt_tpu.ops.megakernel import T_CHUNK, _t_pad
        multi = _t_pad(n_tris) > T_CHUNK
        modes = {"on": [True], "off": [False],
                 "both": [False, True] if multi else [False]}[args.cull]

        for cull in modes:
            def run(k, cull=cull):
                img, aux = render_default_mega(
                    k, scene, cam, cfg, r_tile=args.r_tile,
                    pix_mux=args.pix_mux, interpret=interp, cull=cull)
                return jnp.sum(img), aux["avg_path_length"]

            acc = jnp.float32(0.0)
            for i in range(3):
                probe, _ = run(jax.random.fold_in(key, 900 + i))
                acc = acc + probe
            float(acc)  # fence (block_until_ready unreliable over axon)
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            lens = []
            for i in range(args.frames):
                probe, plen = run(jax.random.fold_in(key, i))
                lens.append(plen)
                acc = acc + probe
            float(acc)
            dt = (time.perf_counter() - t0) / args.frames
            plen = sum(float(x) for x in lens) / len(lens)
            rays = plen * cfg.n_pixels * cfg.samples_per_pixel
            # MFU of the issued compensated-bf16 sweep: 384 bf16 flops per
            # (ray, triangle) test ([Gh|Gh|Gl]@[fh;fl;fh], 2*48*4 per test
            # ignoring M/K tile padding) against a v5e's 197 TFLOP/s bf16
            # peak.  With culling the ISSUED tests shrink — mfu then
            # measures useful-work density, and rays/s is the headline.
            tests_s = rays * n_tris / dt
            row = {"scene": name, "triangles": n_tris,
                   "cull": bool(cull) and multi, "morton": args.morton,
                   "sec_per_frame": round(dt, 4),
                   "avg_path_length": round(plen, 3),
                   "rays_per_sec": round(rays / dt, 1),
                   "ray_tri_tests_per_sec": round(tests_s, 1),
                   "mfu_pct_uncull_equiv": round(
                       tests_s * 384 / 197e12 * 100, 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"config": {"size": args.size, "spp": args.spp,
                                  "bounces": args.bounces,
                                  "r_tile": args.r_tile,
                                  "pix_mux": args.pix_mux},
                       "device": jax.devices()[0].platform,
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
