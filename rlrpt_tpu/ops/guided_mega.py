"""Guided (frozen-map) Pallas TPU megakernel — RL inference at megakernel
throughput.

The reference's reinforcement tracer samples its learned per-volume CDF
INSIDE the render kernel (reinforcement_path_tracing.cu:100-115) and the
thesis prices guided sampling at ~+20% over the default tracer
(Descriptions/write_up/chapters/4_critical_evaluation.tex:272).  Our XLA
SARSA wavefront pays ~31x over the default megakernel instead, and the
r4 whole-frame ablation (SARSA_BENCH.json) pins ~88% of that on dynamic
gathers (CDF row + answer-table row) — latency-bound on TPU at ~10 ns a
query regardless of row size.

This kernel removes every gather from the inference path:

* the guidance distribution is re-keyed from "nearest volume" to
  (hit triangle, quantised barycentric uv) by radiance.bake — an index
  that is pure arithmetic over quantities the Moller-Trumbore sweep
  already produces (the winning triangle's u'/det, v'/det come from the
  same one-hot reduction that fetches the material row);
* the baked (S_pad, C) bf16 CDF table lives in VMEM for the whole frame
  and each ray's column is fetched with a one-hot matmul on the MXU —
  the megakernel's material-fetch pattern (ops/megakernel.py mat_dot),
  cornell: (128, 512) @ (512, r) per bounce;
* sector draw = a comparison count against the fetched column, hi/lo =
  one-hot selects (the r4 one-hot sampler, radiance/volumes.py
  sample_from_cdf_rows), pdf = (hi - lo) * S / 2pi computed in f32 from
  the same rounded values the draw used — quantised-but-consistent, so
  the estimator stays unbiased for ANY baked table;
* sector -> direction is the branch-free Chiu concentric map
  (ops/hemisphere.py concentric_map) evaluated in-kernel, in the same
  frame convention the wavefront trains with (make_frame rows (T, N, B),
  world = x*T + y*N + z*B; hemisphere_helpers.cu:96-121).

Everything else — regenerative slots, pixel multiplexing, in-kernel
counter PRNG, compensated-bf16 intersection, Russian roulette — is the
default megakernel's machinery (ops/megakernel.py).

Scope: single-chunk scenes (n_triangles <= 256 after padding) run the
full (triangle x uv-bin) table.  Multi-chunk scenes are supported with
PER-TRIANGLE tables (uv_bins = 1 — their triangles are already small, so
per-triangle IS fine spatial resolution; no barycentric extraction is
needed because the winner's id rides material row 11 through the
streaming running-argmin).  The one-hot CDF fetch costs 2*C*S flops per
ray-bounce with C = t_pad * uv_bins^2, so wide tables trade ray-tile
width for VMEM (auto-narrowed; hard cap 8192 columns).  Measured economics
(artifacts/guided_multichunk_probe.log): on primary-miss-dominated scenes
like bunny (avg path 1.004) guidance cannot help — ~all samples never hit
a surface to be guided FROM — and the fetch adds ~85% over the culled
default sweep; the support exists for scene-coverage completeness, and
the XLA wavefront remains the learning path for these scenes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.ops.megakernel import (INF, PI, R_TILE, T_CHUNK, _PRECISIONS,
                                      _split_bf16, _uniform,
                                      make_primary_fn, mt_tables)
from rlrpt_tpu.radiance.bake import TriBinCDF
from rlrpt_tpu.scene.scene import Scene


def _concentric_dir(gx, gy, nx, ny, nz, zero, one):
    """Chiu concentric map of unit-square (gx, gy) to the hemisphere about
    normal (nx, ny, nz); returns (dx, dy, dz, cos_theta).

    Identical math to hemisphere.concentric_map + linalg.make_frame /
    frame_to_world (ref: hemisphere_helpers.cu:134-226, :31-63), inlined
    on (1, r) vectors; cos_theta is the local y coordinate (a rotation
    preserves the angle to the frame's N axis).
    """
    a = 2.0 * gx - 1.0
    b = 2.0 * gy - 1.0
    abv = b > -a
    blw = b < a
    pos_b = b > 0.0
    pos_a = a > 0.0

    xx = jnp.where(abv, jnp.where(blw, a, b),
                   jnp.where(b > a, -a, -b))
    yy = jnp.where(
        abv,
        jnp.where(blw, jnp.where(pos_b, b, a + b),
                  jnp.where(pos_a, b - a, -a)),
        jnp.where(b > a, jnp.where(pos_b, -a - b, -b),
                  jnp.where(pos_a, a, a - b)))
    offset = jnp.where(
        abv,
        jnp.where(blw,
                  jnp.where(pos_b, jnp.float32(0.0),
                            jnp.float32(7.0 * PI / 4.0)),
                  jnp.where(pos_a, jnp.float32(PI / 4.0),
                            jnp.float32(PI / 2.0))),
        jnp.where(b > a,
                  jnp.where(pos_b, jnp.float32(3.0 * PI / 4.0),
                            jnp.float32(PI)),
                  jnp.where(pos_a, jnp.float32(3.0 * PI / 2.0),
                            jnp.float32(5.0 * PI / 4.0))))

    origin = xx == 0.0
    safe_xx = jnp.where(origin, one, xx)
    cos_t = 1.0 - xx * xx
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = offset + jnp.float32(PI / 4.0) * (yy / safe_xx)
    lx = sin_t * jnp.cos(phi)
    lz = sin_t * jnp.sin(phi)
    lx = jnp.where(origin, zero, lx)
    lz = jnp.where(origin, zero, lz)
    ly = jnp.where(origin, one, cos_t)

    # make_frame rows (T, N, B); world = lx*T + ly*N + lz*B.
    use_x = jnp.abs(nx) > jnp.abs(ny)
    tx = jnp.where(use_x, nz, zero)
    ty = jnp.where(use_x, zero, -nz)
    tz = jnp.where(use_x, -nx, ny)
    tn = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz,
                                   jnp.float32(1e-30)))
    tx, ty, tz = tx * tn, ty * tn, tz * tn
    bx = ny * tz - nz * ty
    by = nz * tx - nx * tz
    bz = nx * ty - ny * tx
    dx = lx * tx + ly * nx + lz * bx
    dy = lx * ty + ly * ny + lz * by
    dz = lx * tz + ly * nz + lz * bz
    return dx, dy, dz, ly


def _guided_kernel(*refs,
                   n_chunks: int,
                   t_pad: int, t_chunk: int, r_tile: int,
                   width: int, height: int, focal: float, n_pix: int,
                   spp: int, max_bounces: int, env: float, eps: float,
                   pix_mux: int, n_slots: int,
                   n_sectors: int, sector_grid: int, uv_bins: int,
                   n_cols: int,
                   precision=jax.lax.Precision.HIGHEST, unroll: int = 2,
                   compensated: bool = False,
                   russian_roulette: bool = False, rr_start_bounce: int = 3,
                   rr_min_prob: float = 0.05, ablate: str = "none"):
    if n_chunks > 1:
        (seed_ref, cam_ref, g_ref, mtbl_ref, cdf_ref, out_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tr_ref, tg_ref, tb_ref, ps_ref,
         bn_ref, rm_ref, ac_ref, px_ref, km_ref, sa_ref,
         bt_ref, mat_ref) = refs
    else:
        (seed_ref, cam_ref, g_ref, mtbl_ref, cdf_ref, out_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tr_ref, tg_ref, tb_ref, ps_ref,
         bn_ref, rm_ref, ac_ref, px_ref, km_ref, sa_ref) = refs
        bt_ref = mat_ref = None
    tile = pl.program_id(0)
    seed = seed_ref[0]

    r = r_tile
    k_mux = pix_mux
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    slot = tile * r + lane                               # (1, r)

    cpx = cam_ref[0, 0]
    cpy = cam_ref[0, 1]
    cpz = cam_ref[0, 2]
    cy, sy = cam_ref[0, 3], cam_ref[0, 4]
    cx, sx = cam_ref[0, 5], cam_ref[0, 6]

    zero = jnp.zeros((1, r), jnp.float32)
    one = jnp.ones((1, r), jnp.float32)
    pdf_scale = jnp.float32(n_sectors / (2.0 * PI))
    inv_gdir = jnp.float32(1.0 / sector_grid)
    primary = make_primary_fn(cam_ref, r, width, height, focal)

    def _features(ox, oy, oz, dx, dy, dz):
        f = jnp.concatenate([
            ox, oy, oz, dx, dy, dz,
            ox * dx, ox * dy, ox * dz,
            oy * dx, oy * dy, oy * dz,
            oz * dx, oz * dy, oz * dz,
            one,
        ], axis=0)                                        # (16, r)
        if compensated:
            f_hi, f_lo = _split_bf16(f)
            f = jnp.concatenate([f_hi, f_lo, f_hi], axis=0)   # (48, r)
        return f

    def _chunk_q(f, c):
        ds = pl.ds(4 * c * t_chunk, 4 * t_chunk)
        if compensated:
            return jax.lax.dot_general(
                g_ref[ds, :], f, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            g_ref[ds, :], f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def _mat_dot(onehot, c):
        ds = pl.ds(c * t_chunk, t_chunk)
        if compensated:
            oh = onehot.astype(jnp.bfloat16)
            m2 = jax.lax.dot_general(
                mtbl_ref[:, ds], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (32, r)
            return m2[:16] + m2[16:]
        return jax.lax.dot_general(
            mtbl_ref[:, ds], onehot,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision)

    def intersect(ox, oy, oz, dx, dy, dz):
        """MXU sweep; returns (best_t, mat (16, r), u, v) — (u, v) are the
        winning triangle's barycentric hit coordinates (single-chunk
        scenes only; multi-chunk scenes run per-TRIANGLE tables,
        uv_bins == 1, and never read them)."""
        f = _features(ox, oy, oz, dx, dy, dz)
        if n_chunks == 1:
            q = _chunk_q(f, 0)
            det = q[0 * t_chunk:1 * t_chunk]
            up = q[1 * t_chunk:2 * t_chunk]
            vp = q[2 * t_chunk:3 * t_chunk]
            tq = q[3 * t_chunk:4 * t_chunk]
            a = up * det
            b = vp * det
            valid = ((a >= 0.0) & (b >= 0.0) & (a + b <= det * det)
                     & (tq * det > 0.0))
            tt = jnp.where(valid, tq / det, INF)          # (t_chunk, r)
            best_t = jnp.min(tt, axis=0, keepdims=True)
            onehot = ((tt == best_t) & (best_t < INF)).astype(jnp.float32)

            # Winner's u'/v'/det via the same one-hot (sublane
            # reductions); u = u'/det, v = v'/det recover the barycentric
            # coordinates the bake's column index is keyed on.
            uw = jnp.sum(onehot * up, axis=0, keepdims=True)
            vw = jnp.sum(onehot * vp, axis=0, keepdims=True)
            dw = jnp.sum(onehot * det, axis=0, keepdims=True)
            dsafe = jnp.where(dw == 0.0, one, dw)
            return best_t, _mat_dot(onehot, 0), uw / dsafe, vw / dsafe

        # Multi-chunk: the megakernel's streaming running-argmin (see
        # ops/megakernel.py); the triangle id rides material row 11, so
        # the per-TRIANGLE table needs no barycentric extraction.
        bt_ref[:, :] = jnp.full((1, r), INF, jnp.float32)
        mat_ref[:, :] = jnp.zeros((16, r), jnp.float32)
        for c in range(n_chunks):
            q = _chunk_q(f, c)
            det = q[0 * t_chunk:1 * t_chunk]
            up = q[1 * t_chunk:2 * t_chunk]
            vp = q[2 * t_chunk:3 * t_chunk]
            tq = q[3 * t_chunk:4 * t_chunk]
            a = up * det
            b = vp * det
            valid = ((a >= 0.0) & (b >= 0.0) & (a + b <= det * det)
                     & (tq * det > 0.0))
            tt = jnp.where(valid, tq / det, INF)
            cmin = jnp.min(tt, axis=0, keepdims=True)
            onehot = ((tt == cmin) & (cmin < INF)).astype(jnp.float32)
            mat_c = _mat_dot(onehot, c)
            better = cmin < bt_ref[:, :]
            mat_ref[:, :] = jnp.where(better, mat_c, mat_ref[:, :])
            bt_ref[:, :] = jnp.minimum(bt_ref[:, :], cmin)
        return bt_ref[:, :], mat_ref[:, :], zero, zero

    # ---- initial state (identical to ops.megakernel) ---------------------
    it0 = jnp.int32(0)
    in_image0 = slot < n_pix
    dx0, dy0, dz0 = primary(slot, _uniform(seed, slot, it0, 2),
                            _uniform(seed, slot, it0, 3))
    ox_ref[:, :] = jnp.full((1, r), cpx)
    oy_ref[:, :] = jnp.full((1, r), cpy)
    oz_ref[:, :] = jnp.full((1, r), cpz)
    dx_ref[:, :] = dx0
    dy_ref[:, :] = dy0
    dz_ref[:, :] = dz0
    tr_ref[:, :] = one
    tg_ref[:, :] = one
    tb_ref[:, :] = one
    ps_ref[:, :] = zero
    bn_ref[:, :] = jnp.zeros((1, r), jnp.int32)
    rm_ref[:, :] = jnp.where(in_image0, spp - 1, 0).astype(jnp.int32)
    ac_ref[:, :] = in_image0.astype(jnp.int32)
    px_ref[:, :] = slot
    km_ref[:, :] = jnp.zeros((1, r), jnp.int32)
    sa_ref[:, :] = jnp.zeros_like(sa_ref)

    def cond(carry):
        return carry[1] > 0

    def step(it):
        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        tr, tg, tb = tr_ref[:, :], tg_ref[:, :], tb_ref[:, :]
        path_sum = ps_ref[:, :]
        bounce = bn_ref[:, :]
        remaining = rm_ref[:, :]
        act = ac_ref[:, :] > 0
        pix = px_ref[:, :]
        kmx = km_ref[:, :]

        it1 = it + 1
        u1 = _uniform(seed, pix, it1, 0)     # in-sector jitter x
        u2 = _uniform(seed, pix, it1, 1)     # in-sector jitter y
        u3 = _uniform(seed, pix, it1, 2)     # regen primary jitter x
        u4 = _uniform(seed, pix, it1, 3)     # regen primary jitter y
        us = _uniform(seed, pix, it1, 5)     # sector draw

        best_t, mat, u_bar, v_bar = intersect(ox, oy, oz, dx, dy, dz)
        nx, ny, nz = mat[0:1], mat[1:2], mat[2:3]
        cr, cg, cb = mat[3:4], mat[4:5], mat[5:6]
        er, eg, eb = mat[6:7], mat[7:8], mat[8:9]
        is_light = mat[9:10] > 0.5
        tri_id = jnp.round(mat[11:12]).astype(jnp.int32)

        missed = act & (best_t >= INF)
        hit = act & ~missed
        hit_light = hit & is_light
        hit_surface = hit & ~is_light

        envf = jnp.where(missed, jnp.float32(env), 0.0)
        lf = hit_light.astype(jnp.float32)
        crr = tr * (envf + er * lf)
        crg = tg * (envf + eg * lf)
        crb = tb * (envf + eb * lf)
        k_rows = jax.lax.broadcasted_iota(jnp.int32, (k_mux, r), 0)
        ksel = (k_rows == kmx).astype(jnp.float32)        # (K, r)
        sa_ref[0:k_mux, :] += ksel * crr
        sa_ref[k_mux:2 * k_mux, :] += ksel * crg
        sa_ref[2 * k_mux:3 * k_mux, :] += ksel * crb

        exhausted = hit_surface & (bounce + 1 >= max_bounces)
        survive = hit_surface & ~exhausted

        # ---- guided sampling: baked-CDF column via one-hot MXU fetch ----
        # `ablate` (perf attribution only, results are wrong for != none):
        # "uniform" skips everything guided (the kernel's non-guided
        # floor), "fetch" builds the one-hot + matmul but samples the
        # fetched row's raw value (skips the search/select row ops).
        if ablate == "uniform":
            row = None
        else:
            iu = jnp.clip((u_bar * uv_bins).astype(jnp.int32),
                          0, uv_bins - 1)
            iv = jnp.clip((v_bar * uv_bins).astype(jnp.int32),
                          0, uv_bins - 1)
            c_idx = tri_id * (uv_bins * uv_bins) + iu * uv_bins + iv
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_cols, r), 0)
            oh_c = (iota_c == c_idx).astype(jnp.bfloat16)
            row = jax.lax.dot_general(
                cdf_ref[:, :], oh_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (s_pad, r)

        if ablate != "none":
            touch = zero if row is None else row[0:1] * jnp.float32(1e-30)
            sector = jnp.minimum((us * n_sectors).astype(jnp.int32) +
                                 touch.astype(jnp.int32), n_sectors - 1)
            pdf = jnp.full((1, r), jnp.float32(1.0 / n_sectors)) * pdf_scale
        else:
            cnt = jnp.sum((row < us).astype(jnp.int32), axis=0,
                          keepdims=True)
            sector = jnp.minimum(cnt, n_sectors - 1)      # (1, r)
            iota_s = jax.lax.broadcasted_iota(jnp.int32, row.shape, 0)
            hi = jnp.sum(jnp.where(iota_s == sector, row, 0.0), axis=0,
                         keepdims=True)
            lo = jnp.sum(jnp.where(iota_s == sector - 1, row, 0.0), axis=0,
                         keepdims=True)
            # Last sector absorbs all r >= cdf[S-2]: its true probability
            # is 1 - lo (radiance/volumes.py sample_from_cdf_rows,
            # ADVICE r4).
            hi = jnp.where(sector == n_sectors - 1, one, hi)
            pdf = jnp.maximum(hi - lo, 0.0) * pdf_scale
        pdf_safe = jnp.maximum(pdf, jnp.float32(1e-12))

        sxg = sector // sector_grid
        syg = sector - sxg * sector_grid
        gx = (sxg.astype(jnp.float32) + u1) * inv_gdir
        gy = (syg.astype(jnp.float32) + u2) * inv_gdir
        sdx, sdy, sdz, cost = _concentric_dir(gx, gy, nx, ny, nz, zero, one)

        # throughput *= (diffuse/pi) * cos / pdf
        scale = cost / (jnp.float32(PI) * pdf_safe)
        tr = jnp.where(survive, tr * cr * scale, tr)
        tg = jnp.where(survive, tg * cg * scale, tg)
        tb = jnp.where(survive, tb * cb * scale, tb)

        rr_killed = jnp.zeros_like(survive)
        if russian_roulette:
            u5 = _uniform(seed, pix, it1, 4)
            tmax = jnp.maximum(tr, jnp.maximum(tg, tb))
            p = jnp.clip(tmax, jnp.float32(rr_min_prob), jnp.float32(1.0))
            do_rr = survive & (bounce + 1 >= rr_start_bounce)
            rr_killed = do_rr & (u5 >= p)
            keep = (do_rr & ~rr_killed).astype(jnp.float32)
            inv_p = keep / p + (1.0 - keep)
            tr = tr * inv_p
            tg = tg * inv_p
            tb = tb * inv_p
            survive = survive & ~rr_killed

        hx = ox + best_t * dx
        hy = oy + best_t * dy
        hz = oz + best_t * dz
        ox = jnp.where(survive, hx + eps * sdx, ox)
        oy = jnp.where(survive, hy + eps * sdy, oy)
        oz = jnp.where(survive, hz + eps * sdz, oz)
        dx = jnp.where(survive, sdx, dx)
        dy = jnp.where(survive, sdy, dy)
        dz = jnp.where(survive, sdz, dz)

        done = missed | hit_light | rr_killed
        path_sum = (path_sum
                    + jnp.where(done, (bounce + 1).astype(jnp.float32), 0.0)
                    + jnp.where(exhausted, jnp.float32(max_bounces), 0.0))
        bounce = jnp.where(survive, bounce + 1, bounce)

        freed = act & ~survive
        next_pix = pix + n_slots
        step_k = (freed & (remaining <= 0) & (kmx + 1 < k_mux)
                  & (next_pix < n_pix))
        pix = jnp.where(step_k, next_pix, pix)
        kmx = jnp.where(step_k, kmx + 1, kmx)
        remaining = jnp.where(step_k, spp, remaining)
        regen = freed & (remaining > 0)
        pdx, pdy, pdz = primary(pix, u3, u4)
        ox = jnp.where(regen, cpx, ox)
        oy = jnp.where(regen, cpy, oy)
        oz = jnp.where(regen, cpz, oz)
        dx = jnp.where(regen, pdx, dx)
        dy = jnp.where(regen, pdy, dy)
        dz = jnp.where(regen, pdz, dz)
        tr = jnp.where(regen, 1.0, tr)
        tg = jnp.where(regen, 1.0, tg)
        tb = jnp.where(regen, 1.0, tb)
        bounce = jnp.where(regen, 0, bounce)
        remaining = jnp.where(regen, remaining - 1, remaining)
        act = survive | regen

        ox_ref[:, :] = ox
        oy_ref[:, :] = oy
        oz_ref[:, :] = oz
        dx_ref[:, :] = dx
        dy_ref[:, :] = dy
        dz_ref[:, :] = dz
        tr_ref[:, :] = tr
        tg_ref[:, :] = tg
        tb_ref[:, :] = tb
        ps_ref[:, :] = path_sum
        bn_ref[:, :] = bounce
        rm_ref[:, :] = remaining
        ac_ref[:, :] = act.astype(jnp.int32)
        px_ref[:, :] = pix
        km_ref[:, :] = kmx
        return it1, act

    def body(carry):
        it = carry[0]
        act = None
        for _ in range(unroll):
            it, act = step(it)
        return (it, jnp.sum(act.astype(jnp.int32)))

    final = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.sum(in_image0.astype(jnp.int32))))
    it = final[0]

    out_ref[0:3 * k_mux, :] = sa_ref[0:3 * k_mux, :]
    out_ref[3 * k_mux:3 * k_mux + 1, :] = ps_ref[:, :]
    out_ref[3 * k_mux + 1:3 * k_mux + 2, :] = jnp.broadcast_to(
        it.astype(jnp.float32)[None, None], (1, r))
    pad_rows = out_ref.shape[0] - (3 * k_mux + 2)
    if pad_rows > 0:
        out_ref[3 * k_mux + 2:, :] = jnp.zeros((pad_rows, r), jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "r_tile", "pix_mux", "interpret",
                                    "precision", "unroll", "ablate"))
def render_guided_mega(key, scene: Scene, camera: Camera, table: TriBinCDF,
                       cfg: RenderConfig,
                       r_tile: int = R_TILE, pix_mux: int = 8,
                       interpret: bool = False,
                       precision: str = "high3", unroll: int = 2,
                       ablate: str = "none"):
    """Render a frame with frozen-map guided sampling; returns (image, aux).

    Same estimator as the SARSA wavefront's inference side (importance
    sample the learned CDF, weight by brdf*cos/pdf — reinforcement_path_
    tracing.cu:85-120) with the spatial key quantised by radiance.bake;
    unbiased for any baked table (pdf == the actual sampling probability).
    One pallas_call per frame, table resident in VMEM.
    """
    if unroll < 1:
        raise ValueError(f"unroll must be >= 1, got {unroll}")
    if precision not in _PRECISIONS:
        raise ValueError(f"precision must be one of {sorted(_PRECISIONS)}, "
                         f"got {precision!r}")
    n_pix = cfg.n_pixels
    g, mtbl = mt_tables(scene)
    t_pad = g.shape[0] // 4
    t_chunk = min(t_pad, T_CHUNK)
    n_chunks = t_pad // t_chunk
    if n_chunks > 1 and table.uv_bins != 1:
        raise ValueError(
            f"multi-chunk scenes ({t_pad} padded triangles) run guided "
            "inference with PER-TRIANGLE tables — bake with uv_bins=1")
    if table.t_pad != t_pad:
        raise ValueError(
            f"table baked for t_pad={table.t_pad} but scene packs to "
            f"{t_pad}; re-bake with radiance.bake.bake_tri_bin_cdf")
    # Row 11 carries the triangle id (exact through the compensated bf16
    # hi+lo fetch for ids < 2^16, like intersect_pallas' class ids) — the
    # baked table's column index is keyed on it.
    mtbl = mtbl.at[11, :].set(jnp.arange(t_pad, dtype=jnp.float32))

    compensated = precision == "high3"
    if compensated:
        g_hi, g_lo = _split_bf16(g)
        g = jnp.concatenate([g_hi, g_hi, g_lo], axis=1)       # (4T, 48)
        m_hi, m_lo = _split_bf16(mtbl)
        mtbl = jnp.concatenate([m_hi, m_lo], axis=0)          # (32, T)

    cdf = table.cdf.astype(jnp.bfloat16)                      # (S_pad, C)
    s_pad, n_cols = cdf.shape
    # VMEM budget: the (C, r) one-hot + fetch scale with C (see
    # guided_mega_train) — wide tables trade ray-tile width.
    if n_cols > 1024:
        r_tile = min(r_tile, 512)
    if n_cols > 8192:
        raise ValueError(
            f"{n_cols} table columns exceed the guided kernel's VMEM "
            "budget; use the SARSA wavefront for this scene")

    n_slots = int(math.ceil(n_pix / pix_mux / r_tile) * r_tile)
    n_tiles = n_slots // r_tile
    out_rows = int(math.ceil((3 * pix_mux + 2) / 8) * 8)

    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    cam = jnp.stack([
        camera.position[0], camera.position[1], camera.position[2],
        jnp.cos(camera.yaw_y), jnp.sin(camera.yaw_y),
        jnp.cos(camera.yaw_x), jnp.sin(camera.yaw_x),
        jnp.float32(0.0),
    ]).reshape(1, 8).astype(jnp.float32)

    kernel = functools.partial(
        _guided_kernel, n_chunks=n_chunks, t_pad=t_pad, t_chunk=t_chunk,
        r_tile=r_tile, width=cfg.width, height=cfg.height, focal=cfg.focal,
        n_pix=n_pix, spp=cfg.samples_per_pixel,
        max_bounces=cfg.max_ray_bounces, env=cfg.environment_light,
        eps=cfg.eps, pix_mux=pix_mux, n_slots=n_slots,
        n_sectors=table.n_sectors, sector_grid=table.sector_grid,
        uv_bins=table.uv_bins, n_cols=n_cols,
        precision=_PRECISIONS[precision], unroll=unroll,
        compensated=compensated,
        russian_roulette=cfg.russian_roulette,
        rr_start_bounce=cfg.rr_start_bounce, rr_min_prob=cfg.rr_min_prob,
        ablate=ablate)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mtbl.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cdf.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, r_tile), lambda i, s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((1, r_tile), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, r_tile), jnp.int32) for _ in range(5)]
            + [pltpu.VMEM((3 * pix_mux, r_tile), jnp.float32)]
            + ([pltpu.VMEM((1, r_tile), jnp.float32),
                pltpu.VMEM((16, r_tile), jnp.float32)]
               if n_chunks > 1 else [])),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, n_slots), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_pix) * cfg.samples_per_pixel * 8 * (
                t_pad * 140 + 2 * s_pad * n_cols + 300),
            transcendentals=int(n_pix) * cfg.samples_per_pixel * 8 * 6,
            bytes_accessed=(out_rows * n_slots + 65 * t_pad
                            + s_pad * n_cols) * 4),
    )(seed, cam, g, mtbl, cdf)

    k = pix_mux
    rad = jnp.stack([out[c * k:(c + 1) * k, :].reshape(-1)[:n_pix]
                     for c in range(3)], axis=1)
    img = (rad / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
    total = n_pix * cfg.samples_per_pixel
    aux = {"avg_path_length": jnp.sum(out[3 * k, :]) / total,
           "wavefront_iterations": jnp.max(out[3 * k + 1, :]).astype(
               jnp.int32)}
    return img, aux
