"""Thesis evaluation protocol: method-vs-method MAPE at a fixed budget.

Reproduces the reference's headline quality experiment
(Descriptions/write_up/chapters/4_critical_evaluation.tex:47-69, ranking
at :61 and :187; metric Graphing/mape.py:10-21): per scene, render a
high-spp ground truth once, then equal-budget test renders for

  * the default path tracer (uniform hemisphere sampling),
  * expected-SARSA (tabular Q, trained online for N frames first),
  * neural-Q (MLP trained online for N frames, then inference render),

and score each against the GT with the reference's MAPE.  The thesis
protocol is 4096-spp GT / 128-spp tests at 720x720; all knobs are flags
so the same harness runs as a tiny CPU smoke test.

The reference's core claim — RL-guided sampling reaches lower MAPE than
uniform sampling at an equal sample budget — is what the emitted table
demonstrates on this framework.

Usage:
  python -m rlrpt_tpu.tools.evaluate [--size 720] [--gt-spp 4096]
      [--spp 128] [--sarsa-frames 10] [--nq-frames 8] [--out EVAL.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import (DeepLearningConfig, RadianceVolumeConfig,
                              RenderConfig)
from rlrpt_tpu.scene import cornell_box, presets
from rlrpt_tpu.utils.profiling import host_fence
from rlrpt_tpu.utils.image import mape_score, write_png


def _split_chunks(total: int, chunk: int) -> list:
    """Chunk sizes covering `total` exactly (final chunk may be partial)."""
    out = []
    while total > 0:
        out.append(min(chunk, total))
        total -= out[-1]
    return out


def _mape(img, gt):
    """Reference MAPE between [0,1] float images (Graphing/mape.py:10-21
    operates on 8-bit values scaled back to [0,1]; match that exactly by
    quantising both sides)."""
    a = np.round(np.clip(np.asarray(img), 0.0, 1.0) * 255.0)
    b = np.round(np.clip(np.asarray(gt), 0.0, 1.0) * 255.0)
    return mape_score(b, a)


def evaluate_scene(scene, cam, *, size, gt_spp, spp, bounces, sarsa_frames,
                   sarsa_spp, nq_frames, nq_spp, area_per_sample, interpret,
                   key, out_prefix=None, skip_nq=False, skip_sarsa=False,
                   nq_impl="wavefront", russian_roulette=False,
                   sarsa_search="table", nq_train_batching="minibatch",
                   sarsa_defensive_mix=0.0, sarsa_hit_mode="mxu",
                   nq_eps_start=0.05, guided=True, guided_uv_bins=4,
                   guided_sector_grid=11, budget_sec=0.0,
                   gt_cache: str | None = None):
    """Returns a list of result-row dicts for one scene.

    `russian_roulette=True` enables RR on every NON-GT render (method and
    default test renders alike — RR is unbiased, so the GT stays plain;
    BASELINE.json config #3: door_room 'RL + Russian roulette')."""
    from rlrpt_tpu.ops.megakernel import render_default_mega

    rows = []
    rl = RadianceVolumeConfig(area_per_sample=area_per_sample,
                              defensive_mix=sarsa_defensive_mix)
    mk_gt_cfg = lambda s: RenderConfig(  # noqa: E731
        width=size, height=size, samples_per_pixel=s, max_ray_bounces=bounces)
    mk_cfg = lambda s: RenderConfig(  # noqa: E731
        width=size, height=size, samples_per_pixel=s, max_ray_bounces=bounces,
        russian_roulette=russian_roulette)

    def clock(fn, warm=None):
        """Time fn(); if `warm` is given, run-and-fence it first so the
        timed region excludes jit compilation (r4 rows charged first-use
        compile to render_sec, inflating every first-compiled method)."""
        if warm is not None:
            host_fence(warm())
        t0 = time.perf_counter()
        out = fn()
        host_fence(out)  # block_until_ready is unreliable over axon
        return out, time.perf_counter() - t0

    # ---- ground truth ----------------------------------------------------
    # Rendered in <=256-spp chunks, averaged, and FENCED per chunk: long
    # unfenced stretches of queued device work (~60s+) over the tunnelled
    # TPU crash the worker ('kernel fault / worker restarted'), whether as
    # one long dispatch (the original 4096-spp GT) or as many chained
    # ones.  Chunked renders with independent keys are the identical
    # estimator; the per-chunk round-trip is noise next to the render.
    # Chunk lists cover the requested budget EXACTLY (ceil-division with a
    # weighted final partial chunk — ADVICE r3: floor-division silently
    # rendered 256 of a requested 300 spp while reporting 300).

    def render_gt():
        acc = None
        for c, cs in enumerate(_split_chunks(gt_spp, 256)):
            img, _ = render_default_mega(
                jax.random.fold_in(key, 999 + c), scene, cam,
                mk_gt_cfg(cs), r_tile=1024, pix_mux=8,
                interpret=interpret, precision="highest")
            acc = img * cs if acc is None else acc + img * cs
            host_fence(acc)
        return acc / gt_spp

    if gt_cache and os.path.exists(gt_cache):
        gt = jnp.asarray(np.load(gt_cache)["gt"])
        gt_dt = 0.0
    else:
        gt, gt_dt = clock(render_gt)
        if gt_cache:
            np.savez_compressed(gt_cache, gt=np.asarray(gt))
    if out_prefix:
        write_png(f"{out_prefix}_gt.png", np.asarray(gt))

    # ---- default tracer @ test budget ------------------------------------
    (img_d, _), d_dt = clock(
        lambda: render_default_mega(
            jax.random.fold_in(key, 1), scene, cam, mk_cfg(spp),
            r_tile=1024, pix_mux=8, interpret=interpret),
        warm=lambda: render_default_mega(
            jax.random.fold_in(key, 2), scene, cam, mk_cfg(spp),
            r_tile=1024, pix_mux=8, interpret=interpret)[0])
    rows.append({"method": "default", "spp": spp,
                 "mape": round(_mape(img_d, gt), 4),
                 "render_sec": round(d_dt, 2)})
    if out_prefix:
        write_png(f"{out_prefix}_default.png", np.asarray(img_d))

    # ---- expected SARSA: train N frames, then the test render ------------
    if not skip_sarsa:
        from rlrpt_tpu.integrators.sarsa_wavefront import (
            render_frame_sarsa_wavefront)
        from rlrpt_tpu.radiance.grid_bucket import build_volume_class_table
        from rlrpt_tpu.radiance.volumes import build_radiance_volumes

        vols = build_radiance_volumes(scene, rl)
        if sarsa_search == "table":
            grid = build_volume_class_table(vols, scene)
        else:
            from rlrpt_tpu.radiance.grid_bucket import build_volume_grid
            grid = build_volume_grid(vols)
        t0 = time.perf_counter()
        # Training frames chunk at <=8 spp (open scenes make one 32-spp
        # dispatch exceed the tunnel's safe unfenced window — GT note); the
        # total training budget is unchanged, the CDF rebuild just runs per
        # chunk instead of per frame (more frequent than the reference's
        # once-per-frame, same learning rule).
        tr_chunks = _split_chunks(sarsa_spp, 8)
        for f in range(sarsa_frames):
            for c, cs in enumerate(tr_chunks):
                _, vols, _ = render_frame_sarsa_wavefront(
                    jax.random.fold_in(key, 100 + f * len(tr_chunks) + c),
                    scene, cam, vols, grid, mk_cfg(cs), rl, pix_mux=4,
                    interpret=interpret, hit_mode=sarsa_hit_mode)
                host_fence(vols.q)
        s_train_dt = time.perf_counter() - t0
        # Chunked test render (watchdog, see GT note); learning continues
        # across chunks exactly as the reference's test render keeps learning
        # through its own frame.
        def render_sarsa_test():
            acc, v = None, vols
            for c, cs in enumerate(_split_chunks(spp, 16)):
                img, v, _ = render_frame_sarsa_wavefront(
                    jax.random.fold_in(key, 2000 + c), scene, cam, v, grid,
                    mk_cfg(cs), rl, pix_mux=4, interpret=interpret,
                    hit_mode=sarsa_hit_mode)
                acc = img * cs if acc is None else acc + img * cs
                host_fence(acc)
            return acc / spp

        img_s, s_dt = clock(render_sarsa_test)
        rows.append({"method": "sarsa", "spp": spp,
                     "mape": round(_mape(img_s, gt), 4),
                     "train_frames": sarsa_frames, "train_spp": sarsa_spp,
                     "n_volumes": int(vols.n_volumes),
                     "search": sarsa_search,
                     "defensive_mix": sarsa_defensive_mix,
                     "hit_mode": sarsa_hit_mode,
                     "train_sec": round(s_train_dt, 2),
                     "render_sec": round(s_dt, 2)})
        if out_prefix:
            write_png(f"{out_prefix}_sarsa.png", np.asarray(img_s))

        # ---- guided megakernel: frozen trained map, in-kernel sampling --
        # The equal-WALL-CLOCK comparison lives here: bake the trained map
        # (radiance.bake), render the test budget with the guided
        # megakernel (ops.guided_mega — importance sampling at megakernel
        # throughput), then give the DEFAULT megakernel the guided row's
        # exact wall-clock and score both.  This is the reference's
        # "+20% overhead" claim surface (4_critical_evaluation.tex:272)
        # measured end-to-end.
        from rlrpt_tpu.ops.megakernel import T_CHUNK, mt_tables
        t_pad = mt_tables(scene)[0].shape[0] // 4
        if guided and t_pad <= T_CHUNK:
            from rlrpt_tpu.ops.guided_mega import render_guided_mega
            from rlrpt_tpu.radiance.bake import bake_tri_bin_cdf
            g_prec = "highest" if sarsa_hit_mode == "f32" else "high3"
            t0 = time.perf_counter()
            table = bake_tri_bin_cdf(scene, vols, rl, t_pad,
                                     uv_bins=guided_uv_bins,
                                     sector_grid=guided_sector_grid)
            bake_dt = time.perf_counter() - t0

            def render_guided_test():
                acc = None
                for c, cs in enumerate(_split_chunks(spp, 32)):
                    img, _ = render_guided_mega(
                        jax.random.fold_in(key, 4000 + c), scene, cam,
                        table, mk_cfg(cs), r_tile=1024, pix_mux=32,
                        interpret=interpret, precision=g_prec)
                    acc = img * cs if acc is None else acc + img * cs
                    host_fence(acc)
                return acc / spp

            img_g, g_dt = clock(
                render_guided_test,
                warm=lambda: render_guided_mega(
                    jax.random.fold_in(key, 4900), scene, cam, table,
                    mk_cfg(_split_chunks(spp, 32)[0]), r_tile=1024,
                    pix_mux=32, interpret=interpret, precision=g_prec)[0])
            rows.append({"method": "sarsa_guided", "spp": spp,
                         "mape": round(_mape(img_g, gt), 4),
                         "train_frames": sarsa_frames,
                         "train_spp": sarsa_spp,
                         "train_sec": round(s_train_dt, 2),
                         "bake_sec": round(bake_dt, 2),
                         "uv_bins": guided_uv_bins,
                         "sector_grid": guided_sector_grid,
                         "render_sec": round(g_dt, 2),
                         "render_sec_ratio_vs_default":
                             round(g_dt / max(d_dt, 1e-9), 3)})
            if out_prefix:
                write_png(f"{out_prefix}_sarsa_guided.png", np.asarray(img_g))

            # Equal-wall-clock default: same budget as the guided render.
            eq_spp = max(1, int(round(g_dt / max(d_dt / spp, 1e-9))))
            if eq_spp > 128:          # full chunks only (compile hygiene);
                eq_spp = -(-eq_spp // 128) * 128   # rounding UP favours
                # the default comparator, the conservative direction

            def render_default_eq():
                acc = None
                for c, cs in enumerate(_split_chunks(eq_spp, 128)):
                    img, _ = render_default_mega(
                        jax.random.fold_in(key, 5000 + c), scene, cam,
                        mk_cfg(cs), r_tile=1024, pix_mux=8,
                        interpret=interpret)
                    acc = img * cs if acc is None else acc + img * cs
                    host_fence(acc)
                return acc / eq_spp

            img_e, e_dt = clock(render_default_eq)
            rows.append({"method": "default_eqtime", "spp": eq_spp,
                         "mape": round(_mape(img_e, gt), 4),
                         "render_sec": round(e_dt, 2),
                         "matched_to": "sarsa_guided",
                         "time_budget_sec": round(g_dt, 2)})

            # ---- fully in-kernel pipeline: binned-SARSA training mega +
            # guided inference mega (ops.guided_mega_train) — the same
            # training BUDGET as the sarsa row but the whole learning
            # loop runs on the MXU, so train_sec collapses and the
            # equal-time-INCLUDING-training comparison becomes winnable.
            from rlrpt_tpu.ops.guided_mega_train import (init_bin_q,
                                                         rebuild_bin_cdf,
                                                         render_sarsa_mega_train)
            gr = guided_sector_grid
            rl_k = dataclasses.replace(rl, grid_resolution=gr)
            q_b, vis_b = init_bin_q(t_pad, guided_uv_bins, gr,
                                    rl_k.initial_radiance)
            tb_k = rebuild_bin_cdf(q_b, gr, guided_uv_bins, t_pad,
                                   rl.distribution_threshold,
                                   sarsa_defensive_mix)
            # One whole frame per dispatch, CDF rebuilt per frame (the
            # reference's schedule); an in-kernel 32-spp frame runs ~1.4 s
            # on chip, inside the tunnel's safe window.  Compile warm-up
            # (discarded) keeps train_sec honest.
            host_fence(render_sarsa_mega_train(
                jax.random.fold_in(key, 599), scene, cam, tb_k, q_b,
                vis_b, mk_cfg(sarsa_spp), rl_k.radiance_threshold,
                interpret=interpret, precision=g_prec)[1])
            t0 = time.perf_counter()
            for f in range(sarsa_frames):
                _, q_b, vis_b, _aux = render_sarsa_mega_train(
                    jax.random.fold_in(key, 600 + f), scene, cam, tb_k,
                    q_b, vis_b, mk_cfg(sarsa_spp),
                    rl_k.radiance_threshold, interpret=interpret,
                    precision=g_prec)
                tb_k = rebuild_bin_cdf(q_b, gr, guided_uv_bins, t_pad,
                                       rl.distribution_threshold,
                                       sarsa_defensive_mix)
                host_fence(q_b)
            k_train_dt = time.perf_counter() - t0

            def render_mega_test():
                acc = None
                for c, cs in enumerate(_split_chunks(spp, 32)):
                    img, _ = render_guided_mega(
                        jax.random.fold_in(key, 4500 + c), scene, cam,
                        tb_k, mk_cfg(cs), r_tile=1024, pix_mux=32,
                        interpret=interpret, precision=g_prec)
                    acc = img * cs if acc is None else acc + img * cs
                    host_fence(acc)
                return acc / spp

            img_k, k_dt = clock(render_mega_test)
            rows.append({"method": "sarsa_mega", "spp": spp,
                         "mape": round(_mape(img_k, gt), 4),
                         "train_frames": sarsa_frames,
                         "train_spp": sarsa_spp,
                         "train_sec": round(k_train_dt, 2),
                         "uv_bins": guided_uv_bins, "sector_grid": gr,
                         "render_sec": round(k_dt, 2),
                         "total_sec": round(k_train_dt + k_dt, 2)})
            if out_prefix:
                write_png(f"{out_prefix}_sarsa_mega.png", np.asarray(img_k))

            # Equal TOTAL time (training included) default render.
            eq2_spp = max(1, int(round((k_train_dt + k_dt)
                                       / max(d_dt / spp, 1e-9))))
            if eq2_spp > 128:
                eq2_spp = -(-eq2_spp // 128) * 128

            def render_default_eq2():
                acc = None
                for c, cs in enumerate(_split_chunks(eq2_spp, 128)):
                    img, _ = render_default_mega(
                        jax.random.fold_in(key, 5500 + c), scene, cam,
                        mk_cfg(cs), r_tile=1024, pix_mux=8,
                        interpret=interpret)
                    acc = img * cs if acc is None else acc + img * cs
                    host_fence(acc)
                return acc / eq2_spp

            img_e2, e2_dt = clock(render_default_eq2)
            rows.append({"method": "default_eqtotal", "spp": eq2_spp,
                         "mape": round(_mape(img_e2, gt), 4),
                         "render_sec": round(e2_dt, 2),
                         "matched_to": "sarsa_mega (train + render)",
                         "time_budget_sec": round(k_train_dt + k_dt, 2)})

            # ---- fixed WALL-CLOCK budget shootout --------------------
            # Both pipelines get the same `budget_sec` of total wall
            # clock (training INCLUDED for the learned side) and render
            # until it runs out; the learned side amortises its training
            # over the remaining render budget — the production question
            # ("given T seconds, which pipeline?") asked at a realistic
            # T instead of the minimum-total point the eqtotal row uses.
            if budget_sec and budget_sec > k_train_dt + 5.0:
                def timed_render(mk_frame, budget):
                    acc, n = None, 0
                    t0 = time.perf_counter()
                    while time.perf_counter() - t0 < budget:
                        img = mk_frame(n)
                        acc = img * 128 if acc is None else acc + img * 128
                        n += 128
                        host_fence(acc)
                    return acc / n, n, time.perf_counter() - t0

                img_b, n_b, b_dt = timed_render(
                    lambda i: render_guided_mega(
                        jax.random.fold_in(key, 7000 + i), scene, cam,
                        tb_k, mk_cfg(128), r_tile=1024, pix_mux=32,
                        interpret=interpret, precision=g_prec)[0],
                    budget_sec - k_train_dt)
                rows.append({"method": "sarsa_mega_budget", "spp": n_b,
                             "mape": round(_mape(img_b, gt), 4),
                             "budget_sec": budget_sec,
                             "train_sec": round(k_train_dt, 2),
                             "render_sec": round(b_dt, 2)})
                img_db, n_db, db_dt = timed_render(
                    lambda i: render_default_mega(
                        jax.random.fold_in(key, 8000 + i), scene, cam,
                        mk_cfg(128), r_tile=1024, pix_mux=8,
                        interpret=interpret)[0],
                    budget_sec)
                rows.append({"method": "default_budget", "spp": n_db,
                             "mape": round(_mape(img_db, gt), 4),
                             "budget_sec": budget_sec,
                             "render_sec": round(db_dt, 2)})

    # ---- neural-Q: online-train N frames, then inference render ----------
    if not skip_nq:
        from rlrpt_tpu.deep.neural_q import init_neural_q

        # Regenerative-wavefront tracers by default (the lockstep pair
        # matches the reference schedule exactly but is ~50x slower —
        # NEURAL_Q_BENCH; both implement the same estimator/learning rule,
        # tests/test_deep_wavefront.py).
        if nq_impl == "wavefront":
            import functools
            from rlrpt_tpu.deep.deep_wavefront import (
                render_frame_neural_q_wavefront,
                render_frame_pretrained_wavefront as nq_inf_fn)
            nq_train_fn = functools.partial(
                render_frame_neural_q_wavefront,
                train_batching=nq_train_batching)
            # Whole frames fit the tunnel's safe dispatch window at
            # wavefront speed; chunk at <=16 spp anyway for open scenes.
            nq_chunk, inf_chunk = 16, 64
        else:
            from rlrpt_tpu.deep.neural_q import (
                render_frame_neural_q as nq_train_fn)
            from rlrpt_tpu.deep.pretrained import (
                render_frame_pretrained as nq_inf_fn)
            nq_chunk, inf_chunk = 4, 16

        dl = DeepLearningConfig()
        params, opt_state = init_neural_q(jax.random.fold_in(key, 7), scene,
                                          dl, rl.grid_resolution)
        # The reference trains at CONSTANT eps = EPSILON_START = EPSILON_MIN
        # = 0.05 (deep_learning_settings.h:5-7) — importance sampling from
        # the Q net is its exploration.  r4 used eps=1.0 (an anneal the
        # reference never runs).
        eps = nq_eps_start
        t0 = time.perf_counter()
        nq_chunks = _split_chunks(nq_spp, nq_chunk)
        for f in range(nq_frames):
            for c, cs in enumerate(nq_chunks):
                _, params, opt_state, eps, _ = nq_train_fn(
                    jax.random.fold_in(key, 200 + f * len(nq_chunks) + c),
                    scene, cam, params, opt_state, eps, mk_cfg(cs), rl, dl,
                    interpret=interpret)
                host_fence(params)  # per-chunk fence (see GT note)
        nq_train_dt = time.perf_counter() - t0

        def render_nq_test():
            acc = None
            for c, cs in enumerate(_split_chunks(spp, inf_chunk)):
                img, _ = nq_inf_fn(
                    jax.random.fold_in(key, 3000 + c), scene, cam, params,
                    mk_cfg(cs), rl, dl, interpret=interpret)
                acc = img * cs if acc is None else acc + img * cs
                host_fence(acc)
            return acc / spp

        img_n, nq_dt = clock(render_nq_test)
        rows.append({"method": "neural_q", "spp": spp,
                     "mape": round(_mape(img_n, gt), 4),
                     "train_frames": nq_frames, "train_spp": nq_spp,
                     "train_sec": round(nq_train_dt, 2),
                     "render_sec": round(nq_dt, 2), "impl": nq_impl,
                     "eps_start": nq_eps_start,
                     "train_batching": nq_train_batching})
        if out_prefix:
            write_png(f"{out_prefix}_neural_q.png", np.asarray(img_n))

    for r in rows:
        r["gt_spp"] = gt_spp
        r["gt_render_sec"] = round(gt_dt, 2)
        r["size"] = size
        r["bounces"] = bounces
        if russian_roulette:
            r["russian_roulette"] = True
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--size", type=int, default=720)
    ap.add_argument("--gt-spp", type=int, default=4096)
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--bounces", type=int, default=80)
    ap.add_argument("--sarsa-frames", type=int, default=10)
    ap.add_argument("--sarsa-spp", type=int, default=32)
    ap.add_argument("--nq-frames", type=int, default=8)
    ap.add_argument("--nq-spp", type=int, default=8)
    ap.add_argument("--area-per-sample", type=float, default=0.001)
    ap.add_argument("--skip-nq", action="store_true")
    ap.add_argument("--skip-sarsa", action="store_true")
    ap.add_argument("--nq-impl", choices=("wavefront", "lockstep"),
                    default="wavefront")
    ap.add_argument("--russian-roulette", action="store_true",
                    help="RR on all non-GT renders (BASELINE config #3)")
    ap.add_argument("--sarsa-search", choices=("table", "grid"),
                    default="table")
    ap.add_argument("--nq-train-batching", choices=("minibatch", "fused"),
                    default="minibatch")
    ap.add_argument("--sarsa-defensive-mix", type=float, default=0.0,
                    help="blend mix*uniform into the sector CDF "
                         "(defensive importance sampling; 0 = reference)")
    ap.add_argument("--gt-cache-dir", default=None,
                    help="cache the ground truth per (scene,size,spp,"
                         "bounces) as .npz here — refresh runs skip the "
                         "most expensive render")
    ap.add_argument("--budget-sec", type=float, default=60.0,
                    help="fixed wall-clock budget for the train+render "
                         "vs default shootout rows (0 = skip)")
    ap.add_argument("--skip-guided", action="store_true",
                    help="skip the guided-megakernel + equal-wall-clock "
                         "rows (they run whenever sarsa runs and the "
                         "scene fits one triangle chunk)")
    ap.add_argument("--guided-uv-bins", type=int, default=4)
    ap.add_argument("--guided-sector-grid", type=int, default=11)
    ap.add_argument("--nq-eps-start", type=float, default=0.05,
                    help="neural-Q initial epsilon (the reference runs "
                         "CONSTANT 0.05, deep_learning_settings.h:5-7; "
                         "r4 rows used 1.0)")
    ap.add_argument("--sarsa-hit-mode", choices=("mxu", "f32"),
                    default="mxu",
                    help="f32 = exact Cramer hit kernel (needed on scenes "
                         "with sub-1e-3 near-coplanar geometry, e.g. "
                         "simple_room's flush light panel)")
    ap.add_argument("--append", action="store_true",
                    help="merge rows into an existing --out file, "
                         "replacing rows with the same (scene, method)")
    ap.add_argument("--out", default="EVAL.json")
    ap.add_argument("--out-prefix", default=None,
                    help="if set, write PNGs <prefix>_{gt,default,...}.png")
    args = ap.parse_args(argv)

    interpret = jax.default_backend() == "cpu"
    if args.scene == "cornell":
        scene = cornell_box()
        cam = Camera.create([0.0, 0.0, -3.0])
    else:
        p = presets.get(args.scene)
        scene = p.load()
        cam = Camera.create(p.camera_position)

    rows = evaluate_scene(
        scene, cam, size=args.size, gt_spp=args.gt_spp, spp=args.spp,
        bounces=args.bounces, sarsa_frames=args.sarsa_frames,
        sarsa_spp=args.sarsa_spp, nq_frames=args.nq_frames,
        nq_spp=args.nq_spp, area_per_sample=args.area_per_sample,
        interpret=interpret, key=jax.random.PRNGKey(1984),
        out_prefix=args.out_prefix, skip_nq=args.skip_nq,
        skip_sarsa=args.skip_sarsa, nq_impl=args.nq_impl,
        russian_roulette=args.russian_roulette,
        sarsa_search=args.sarsa_search,
        nq_train_batching=args.nq_train_batching,
        sarsa_defensive_mix=args.sarsa_defensive_mix,
        sarsa_hit_mode=args.sarsa_hit_mode,
        nq_eps_start=args.nq_eps_start, guided=not args.skip_guided,
        guided_uv_bins=args.guided_uv_bins,
        guided_sector_grid=args.guided_sector_grid,
        budget_sec=args.budget_sec,
        gt_cache=(os.path.join(
            args.gt_cache_dir,
            f"gt_{args.scene}_{args.size}_{args.gt_spp}_{args.bounces}"
            f"{'_rr' if args.russian_roulette else ''}.npz")
            if args.gt_cache_dir else None))
    for r in rows:
        r["scene"] = args.scene
    result = {"protocol": "thesis MAPE (4_critical_evaluation.tex:47-69)",
              "backend": jax.default_backend(), "rows": rows}
    if args.append and os.path.exists(args.out):
        with open(args.out) as f:
            old = json.load(f)
        # Preserve any top-level keys a previous run added (e.g. "notes").
        for k, v in old.items():
            if k not in ("rows", "protocol", "backend"):
                result[k] = v
        new_keys = {(r["scene"], r["method"]) for r in rows}
        kept = [r for r in old.get("rows", [])
                if (r.get("scene"), r.get("method")) not in new_keys]
        result["rows"] = kept + rows
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
