"""In-kernel expected-SARSA learning megakernel (binned Q-state).

The XLA SARSA wavefront's learning frame costs ~0.32 s at the cornell
bench point, ~88% of it dynamic gathers + scatters around the 24.5k-volume
Q-table (SARSA_BENCH.json).  This kernel moves the ENTIRE learning loop
inside one pallas_call by re-keying the Q-state the same way the guided
inference megakernel re-keys its CDF (radiance/bake.py): the state space
is (triangle x uv-bin), the (S_pad, C) Q-table and visit counts live in
VMEM scratch, and every per-ray interaction is a matmul or a VPU
elementwise op:

* CDF fetch + sector draw + pdf: identical to ops/guided_mega.py (the
  sampling distribution is the frame-START CDF, rebuilt between frames —
  exactly the reference's once-per-frame update_radiance_distribution,
  reinforcement_path_tracing.cu:6-13);
* TD bootstrap: the LIVE per-bin irradiance estimate (radiance_volume.cu:
  49-69 semantics: sum_s Q*cos * lum/pi * 2pi/S) recomputed each
  iteration from the in-VMEM Q — one (8, C) @ (C, r) fetch rides the
  same one-hot as the CDF column;
* TD scatter: per-iteration batched accumulation
  sum_t[s, c] = sum_lanes onehot_sector * target,  cnt[s, c] = ...,
  as ONE (3*S_pad, r) @ (r, C) matmul contracting the LANE axis (targets
  ride as a compensated bf16 hi/lo pair so the f32 sums carry ~1e-5
  relative error; counts are exact small ints);
* update: the exact sequential composition of the reference's running
  mean, Q <- (Q*(1+V) + sum_t) / (1+V+cnt) (radiance_volume.cu:283-301
  == radiance/volumes.py apply_sarsa_contributions), applied per
  iteration batch — the same serialisation the XLA wavefront uses.

Tiles run sequentially on the TensorCore, so the VMEM Q persists across
the grid: tile k trains on the Q left by tiles < k (another valid
serialisation of the reference's racy atomics, thesis
4_critical_evaluation.tex:266).  Frame outputs: radiance rows + the
final (q, visits) + a TD-scatter counter whose total must equal the
visit-count delta exactly (the invariant the XLA path asserts).
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
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.ops.guided_mega import _concentric_dir
from rlrpt_tpu.ops.megakernel import (INF, PI, T_CHUNK, _PRECISIONS,
                                      _split_bf16, _uniform,
                                      make_primary_fn, mt_tables)
from rlrpt_tpu.radiance.bake import TriBinCDF
from rlrpt_tpu.scene.scene import Scene


def bin_luminance(scene: Scene, t_pad: int, uv_bins: int) -> jnp.ndarray:
    """(1, C) per-bin surface luminance (== the bin's triangle's material
    luminance; every bin of a triangle shares it)."""
    b = uv_bins * uv_bins
    lum = jnp.pad(jnp.asarray(scene.luminance, jnp.float32),
                  (0, t_pad - scene.v0.shape[0]))
    return jnp.repeat(lum, b)[None, :]


def init_bin_q(t_pad: int, uv_bins: int, sector_grid: int,
               initial_radiance: float):
    """Fresh (q, visits) for the binned trainer: (S_pad, C) f32 each.
    Padding sector rows hold zeros (never scattered into — the sampler
    clamps sectors to S-1)."""
    s = sector_grid * sector_grid
    s_pad = int(math.ceil(s / 8) * 8)
    c = t_pad * uv_bins * uv_bins
    q = jnp.zeros((s_pad, c), jnp.float32).at[:s, :].set(initial_radiance)
    return q, jnp.zeros((s_pad, c), jnp.float32)


def rebuild_bin_cdf(q: jnp.ndarray, sector_grid: int, uv_bins: int,
                    t_pad: int, distribution_threshold: float = 0.0,
                    defensive_mix: float = 0.0) -> TriBinCDF:
    """Frame-boundary CDF rebuild from the binned Q (the reference's
    update_radiance_distribution, radiance_volume.cu:149-188, on the
    binned state space).  Returns a TriBinCDF for the next frame."""
    s = sector_grid * sector_grid
    s_pad = q.shape[0]
    cos = hs.sector_cos_thetas(sector_grid)                  # (S,)
    w = jnp.maximum(q[:s, :] * cos[:, None], distribution_threshold)
    total = 1e-10 + jnp.sum(w, axis=0, keepdims=True)
    p = w / total
    if defensive_mix:
        p = (1.0 - defensive_mix) * p + defensive_mix / s
    cdf = jnp.cumsum(p, axis=0)
    cdf = cdf.at[s - 1, :].set(1.0)
    out = jnp.full((s_pad, q.shape[1]), 2.0, jnp.float32).at[:s, :].set(cdf)
    return TriBinCDF(cdf=out.astype(jnp.bfloat16), sector_grid=sector_grid,
                     uv_bins=uv_bins, t_pad=t_pad)


def _train_kernel(seed_ref, cam_ref, g_ref, mtbl_ref, cdf_ref, lum_ref,
                  cos_ref, q0_ref, v0_ref,
                  out_ref, q_out_ref, v_out_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tr_ref, tg_ref, tb_ref, ps_ref,
                  bn_ref, rm_ref, ac_ref, px_ref, km_ref, sa_ref,
                  cb_ref, cs_ref, cw_ref, tc_ref, *,
                  t_pad: int, t_chunk: int, r_tile: int,
                  width: int, height: int, focal: float, n_pix: int,
                  spp: int, max_bounces: int, env: float, eps: float,
                  pix_mux: int, n_slots: int, n_tiles: int,
                  n_sectors: int, sector_grid: int, uv_bins: int,
                  n_cols: int, radiance_threshold: float,
                  compensated: bool = True,
                  precision=jax.lax.Precision.HIGHEST, unroll: int = 2,
                  russian_roulette: bool = False, rr_start_bounce: int = 3,
                  rr_min_prob: float = 0.05):
    tile = pl.program_id(0)
    seed = seed_ref[0]
    r = r_tile
    k_mux = pix_mux
    s_pad = q0_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    slot = tile * r + lane

    cpx, cpy, cpz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    cy, sy = cam_ref[0, 3], cam_ref[0, 4]
    cx, sx = cam_ref[0, 5], cam_ref[0, 6]
    zero = jnp.zeros((1, r), jnp.float32)
    one = jnp.ones((1, r), jnp.float32)
    pdf_scale = jnp.float32(n_sectors / (2.0 * PI))
    inv_gdir = jnp.float32(1.0 / sector_grid)
    primary = make_primary_fn(cam_ref, r, width, height, focal)
    # Per-sector cos(theta) column for the irradiance estimate
    # (hemisphere.sector_cos_thetas, passed as a (s_pad, 128) input —
    # Pallas forbids captured array constants; column 0 carries the table).
    cos_col = cos_ref[:, 0:1]
    irr_scale = jnp.float32(2.0 * PI / n_sectors) / jnp.float32(PI)

    # The Q / visit state lives in the OUTPUT refs, which map to the same
    # (whole-array) block for every grid step and therefore persist across
    # the sequential tiles — no separate scratch copy (VMEM: a scene like
    # complex_light_room has C = 2688 columns and the extra (S_pad, C)
    # pair overflowed the 16 MB scoped budget).  Tile 0 seeds from the
    # inputs.
    q_ref, vis_ref = q_out_ref, v_out_ref

    @pl.when(tile == 0)
    def _seed_state():
        q_ref[:, :] = q0_ref[:, :]
        vis_ref[:, :] = v0_ref[:, :]

    def intersect(ox, oy, oz, dx, dy, dz):
        f = jnp.concatenate([
            ox, oy, oz, dx, dy, dz,
            ox * dx, ox * dy, ox * dz,
            oy * dx, oy * dy, oy * dz,
            oz * dx, oz * dy, oz * dz,
            one,
        ], axis=0)
        if compensated:
            f_hi, f_lo = _split_bf16(f)
            f = jnp.concatenate([f_hi, f_lo, f_hi], axis=0)
            q = jax.lax.dot_general(
                g_ref[:, :], f, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            q = jax.lax.dot_general(
                g_ref[:, :], f, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        det = q[0 * t_chunk:1 * t_chunk]
        up = q[1 * t_chunk:2 * t_chunk]
        vp = q[2 * t_chunk:3 * t_chunk]
        tq = q[3 * t_chunk:4 * t_chunk]
        a = up * det
        b = vp * det
        valid = ((a >= 0.0) & (b >= 0.0) & (a + b <= det * det)
                 & (tq * det > 0.0))
        tt = jnp.where(valid, tq / det, INF)
        best_t = jnp.min(tt, axis=0, keepdims=True)
        onehot = ((tt == best_t) & (best_t < INF)).astype(jnp.float32)
        uw = jnp.sum(onehot * up, axis=0, keepdims=True)
        vw = jnp.sum(onehot * vp, axis=0, keepdims=True)
        dw = jnp.sum(onehot * det, axis=0, keepdims=True)
        dsafe = jnp.where(dw == 0.0, one, dw)
        if compensated:
            oh = onehot.astype(jnp.bfloat16)
            m2 = jax.lax.dot_general(
                mtbl_ref[:, :], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mat = m2[:16] + m2[16:]
        else:
            mat = jax.lax.dot_general(
                mtbl_ref[:, :], onehot,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision)
        return best_t, mat, uw / dsafe, vw / dsafe

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
    cb_ref[:, :] = jnp.zeros((1, r), jnp.int32)      # pending bin
    cs_ref[:, :] = jnp.full((1, r), -1, jnp.int32)   # pending sector
    cw_ref[:, :] = zero                              # pending brdf (lum/pi)
    tc_ref[:, :] = zero                              # TD scatter counter

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
        cur_bin = cb_ref[:, :]
        cur_sec = cs_ref[:, :]
        cur_brdf = cw_ref[:, :]

        it1 = it + 1
        u1 = _uniform(seed, pix, it1, 0)
        u2 = _uniform(seed, pix, it1, 1)
        u3 = _uniform(seed, pix, it1, 2)
        u4 = _uniform(seed, pix, it1, 3)
        us = _uniform(seed, pix, it1, 5)

        best_t, mat, u_bar, v_bar = intersect(ox, oy, oz, dx, dy, dz)
        nx, ny, nz = mat[0:1], mat[1:2], mat[2:3]
        cr, cg, cb_ = mat[3:4], mat[4:5], mat[5:6]
        er, eg, eb = mat[6:7], mat[7:8], mat[8:9]
        is_light = mat[9:10] > 0.5
        lum = mat[10:11]
        tri_id = jnp.round(mat[11:12]).astype(jnp.int32)

        missed = act & (best_t >= INF)
        hit = act & ~missed
        hit_light = hit & is_light
        hit_surface = hit & ~is_light

        # ---- new bin + CDF column + LIVE irradiance fetch ----------------
        iu = jnp.clip((u_bar * uv_bins).astype(jnp.int32), 0, uv_bins - 1)
        iv = jnp.clip((v_bar * uv_bins).astype(jnp.int32), 0, uv_bins - 1)
        c_idx = tri_id * (uv_bins * uv_bins) + iu * uv_bins + iv
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_cols, r), 0)
        oh_new = (iota_c == c_idx).astype(jnp.bfloat16)      # (C, r)
        row = jax.lax.dot_general(
            cdf_ref[:, :], oh_new, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (s_pad, r)
        # irradiance estimate per bin from the LIVE q: one fused row —
        # irr = (sum_s q*cos) * lum/pi * 2pi/S (radiance_volume.cu:49-69,
        # :305-307) — fetched through the same one-hot.  hi/lo split so
        # the bf16 fetch carries f32 accuracy.
        irr_vec = (jnp.sum(q_ref[:, :] * cos_col, axis=0, keepdims=True)
                   * lum_ref[:, :] * irr_scale)              # (1, C)
        ihil = _split_bf16(irr_vec)
        irr8 = jnp.concatenate(
            [ihil[0], ihil[1], jnp.zeros((6, n_cols), jnp.bfloat16)], axis=0)
        ifetch = jax.lax.dot_general(
            irr8, oh_new, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (8, r)
        irr_b = ifetch[0:1] + ifetch[1:2]                    # (1, r)

        # ---- TD target + batched scatter (one matmul over the lane axis)
        target = jnp.where(
            missed, cur_brdf * jnp.float32(env),
            jnp.where(hit_light, cur_brdf * lum, cur_brdf * irr_b))
        pending = act & (cur_sec >= 0)
        pf = pending.astype(jnp.float32)
        tc_ref[:, :] += pf
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (s_pad, r), 0)
        ohs = ((iota_s == cur_sec) & pending).astype(jnp.float32)
        t_hi, t_lo = _split_bf16(target)
        rows3 = jnp.concatenate([
            (ohs * t_hi.astype(jnp.float32)).astype(jnp.bfloat16),
            (ohs * t_lo.astype(jnp.float32)).astype(jnp.bfloat16),
            ohs.astype(jnp.bfloat16),
        ], axis=0)                                           # (3*s_pad, r)
        oh_prev = (iota_c == cur_bin).astype(jnp.bfloat16)   # (C, r)
        acc = jax.lax.dot_general(
            rows3, oh_prev, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (3*s_pad, C)
        sum_t = acc[0:s_pad] + acc[s_pad:2 * s_pad]
        cnt = acc[2 * s_pad:3 * s_pad]
        # Exact composition of the reference's running mean
        # (radiance_volume.cu:283-301; radiance/volumes.py
        # apply_sarsa_contributions) on the whole (S_pad, C) grid.
        vis = vis_ref[:, :]
        q_old = q_ref[:, :]
        q_new = (q_old * (1.0 + vis) + sum_t) / (1.0 + vis + cnt)
        q_new = jnp.maximum(q_new, jnp.float32(radiance_threshold))
        q_ref[:, :] = jnp.where(cnt > 0, q_new, q_old)
        vis_ref[:, :] = vis + cnt

        # ---- terminal contributions --------------------------------------
        envf = jnp.where(missed, jnp.float32(env), 0.0)
        lf = hit_light.astype(jnp.float32)
        crr = tr * (envf + er * lf)
        crg = tg * (envf + eg * lf)
        crb = tb * (envf + eb * lf)
        k_rows = jax.lax.broadcasted_iota(jnp.int32, (k_mux, r), 0)
        ksel = (k_rows == kmx).astype(jnp.float32)
        sa_ref[0:k_mux, :] += ksel * crr
        sa_ref[k_mux:2 * k_mux, :] += ksel * crg
        sa_ref[2 * k_mux:3 * k_mux, :] += ksel * crb

        exhausted = hit_surface & (bounce + 1 >= max_bounces)
        survive = hit_surface & ~exhausted

        # ---- sample the next sector from the frame-start CDF -------------
        cnt_row = jnp.sum((row < us).astype(jnp.int32), axis=0,
                          keepdims=True)
        sector = jnp.minimum(cnt_row, n_sectors - 1)
        hi = jnp.sum(jnp.where(iota_s == sector, row, 0.0), axis=0,
                     keepdims=True)
        lo = jnp.sum(jnp.where(iota_s == sector - 1, row, 0.0), axis=0,
                     keepdims=True)
        hi = jnp.where(sector == n_sectors - 1, one, hi)
        pdf = jnp.maximum(hi - lo, 0.0) * pdf_scale
        pdf_safe = jnp.maximum(pdf, jnp.float32(1e-12))

        sxg = sector // sector_grid
        syg = sector - sxg * sector_grid
        gx = (sxg.astype(jnp.float32) + u1) * inv_gdir
        gy = (syg.astype(jnp.float32) + u2) * inv_gdir
        sdx, sdy, sdz, cost = _concentric_dir(gx, gy, nx, ny, nz, zero, one)

        scale = cost / (jnp.float32(PI) * pdf_safe)
        tr = jnp.where(survive, tr * cr * scale, tr)
        tg = jnp.where(survive, tg * cg * scale, tg)
        tb = jnp.where(survive, tb * cb_ * scale, tb)

        rr_killed = jnp.zeros_like(survive)
        if russian_roulette:
            u5 = _uniform(seed, pix, it1, 4)
            tmax = jnp.maximum(tr, jnp.maximum(tg, tb))
            p = jnp.clip(tmax, jnp.float32(rr_min_prob), jnp.float32(1.0))
            do_rr = survive & (bounce + 1 >= rr_start_bounce)
            rr_killed = do_rr & (u5 >= p)
            keep = (do_rr & ~rr_killed).astype(jnp.float32)
            inv_p = keep / p + (1.0 - keep)
            tr, tg, tb = tr * inv_p, tg * inv_p, tb * inv_p
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

        # pending transition for the NEXT vertex (sector just sampled;
        # brdf = this surface's luminance/pi,
        # ref: reinforcement_path_tracing.cu:104-110)
        cur_bin = jnp.where(survive, c_idx, cur_bin)
        cur_sec = jnp.where(survive, sector, -1)
        cur_brdf = jnp.where(survive, lum / jnp.float32(PI), cur_brdf)

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
        cur_sec = jnp.where(regen, -1, cur_sec)
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
        cb_ref[:, :] = cur_bin
        cs_ref[:, :] = cur_sec
        cw_ref[:, :] = cur_brdf
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
    out_ref[3 * k_mux + 2:3 * k_mux + 3, :] = tc_ref[:, :]
    pad_rows = out_ref.shape[0] - (3 * k_mux + 3)
    if pad_rows > 0:
        out_ref[3 * k_mux + 3:, :] = jnp.zeros((pad_rows, r), jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "r_tile", "pix_mux", "interpret",
                                    "precision", "unroll", "sector_grid",
                                    "uv_bins", "radiance_threshold"))
def render_sarsa_mega_train(key, scene: Scene, camera: Camera,
                            table: TriBinCDF, q, visits,
                            cfg: RenderConfig,
                            radiance_threshold: float,
                            r_tile: int = 1024, pix_mux: int = 32,
                            interpret: bool = False,
                            precision: str = "high3", unroll: int = 2,
                            sector_grid: int | None = None,
                            uv_bins: int | None = None):
    """One in-kernel SARSA learning frame on the binned Q-state.

    Returns (image (H,W,3), q, visits, aux) — aux carries avg_path_length,
    wavefront_iterations and td_scatter_count (== the exact visit-count
    delta, the invariant tests assert).  Rebuild the CDF between frames
    with rebuild_bin_cdf (the reference's once-per-frame schedule).
    """
    if precision not in _PRECISIONS:
        raise ValueError(f"precision must be one of {sorted(_PRECISIONS)}")
    sector_grid = table.sector_grid if sector_grid is None else sector_grid
    uv_bins = table.uv_bins if uv_bins is None else uv_bins
    n_pix = cfg.n_pixels
    g, mtbl = mt_tables(scene)
    t_pad = g.shape[0] // 4
    if t_pad > T_CHUNK:
        raise ValueError("binned SARSA megakernel supports single-chunk "
                         f"scenes (<= {T_CHUNK} padded triangles)")
    if table.t_pad != t_pad:
        raise ValueError(f"table t_pad {table.t_pad} != scene t_pad {t_pad}")
    # Keep the kernel inside the 16 MB scoped-VMEM budget: the transient
    # (C, r) one-hots + the (3*S_pad, C) accumulator scale with C, so
    # larger scenes trade ray-tile width for table width.
    n_cols_est = t_pad * table.uv_bins * table.uv_bins
    if n_cols_est > 1024:
        r_tile = min(r_tile, 512)
    if n_cols_est > 5376:
        raise ValueError(
            f"{n_cols_est} bins exceed the training kernel's VMEM budget; "
            "reduce uv_bins or use the XLA SARSA wavefront")
    mtbl = mtbl.at[11, :].set(jnp.arange(t_pad, dtype=jnp.float32))

    compensated = precision == "high3"
    if compensated:
        g_hi, g_lo = _split_bf16(g)
        g = jnp.concatenate([g_hi, g_hi, g_lo], axis=1)
        m_hi, m_lo = _split_bf16(mtbl)
        mtbl = jnp.concatenate([m_hi, m_lo], axis=0)

    cdf = table.cdf.astype(jnp.bfloat16)
    s_pad, n_cols = cdf.shape
    s = sector_grid * sector_grid
    lum_row = bin_luminance(scene, t_pad, uv_bins)
    cos = hs.sector_cos_thetas(sector_grid)                  # (S,)
    cos_in = jnp.zeros((s_pad, 128), jnp.float32).at[:s, 0].set(cos)

    n_slots = int(math.ceil(n_pix / pix_mux / r_tile) * r_tile)
    n_tiles = n_slots // r_tile
    out_rows = int(math.ceil((3 * pix_mux + 3) / 8) * 8)

    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    cam = jnp.stack([
        camera.position[0], camera.position[1], camera.position[2],
        jnp.cos(camera.yaw_y), jnp.sin(camera.yaw_y),
        jnp.cos(camera.yaw_x), jnp.sin(camera.yaw_x),
        jnp.float32(0.0),
    ]).reshape(1, 8).astype(jnp.float32)

    kernel = functools.partial(
        _train_kernel, t_pad=t_pad, t_chunk=t_pad,
        r_tile=r_tile, width=cfg.width, height=cfg.height, focal=cfg.focal,
        n_pix=n_pix, spp=cfg.samples_per_pixel,
        max_bounces=cfg.max_ray_bounces, env=cfg.environment_light,
        eps=cfg.eps, pix_mux=pix_mux, n_slots=n_slots, n_tiles=n_tiles,
        n_sectors=s, sector_grid=sector_grid, uv_bins=uv_bins,
        n_cols=n_cols, radiance_threshold=radiance_threshold,
        compensated=compensated,
        precision=_PRECISIONS[precision], unroll=unroll,
        russian_roulette=cfg.russian_roulette,
        rr_start_bounce=cfg.rr_start_bounce, rr_min_prob=cfg.rr_min_prob)

    vspec = lambda shape: pl.BlockSpec(shape, lambda i, s_: (0, 0),  # noqa
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[vspec((1, 8)), vspec(g.shape), vspec(mtbl.shape),
                  vspec(cdf.shape), vspec((1, n_cols)),
                  vspec((s_pad, 128)),
                  vspec((s_pad, n_cols)), vspec((s_pad, n_cols))],
        out_specs=(pl.BlockSpec((out_rows, r_tile), lambda i, s_: (0, i),
                                memory_space=pltpu.VMEM),
                   vspec((s_pad, n_cols)), vspec((s_pad, n_cols))),
        scratch_shapes=(
            [pltpu.VMEM((1, r_tile), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, r_tile), jnp.int32) for _ in range(5)]
            + [pltpu.VMEM((3 * pix_mux, r_tile), jnp.float32)]
            + [pltpu.VMEM((1, r_tile), jnp.int32),      # cur bin
               pltpu.VMEM((1, r_tile), jnp.int32),      # cur sector
               pltpu.VMEM((1, r_tile), jnp.float32),    # cur brdf
               pltpu.VMEM((1, r_tile), jnp.float32)]    # td counter
        ),
    )
    out, q_out, v_out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((out_rows, n_slots), jnp.float32),
                   jax.ShapeDtypeStruct((s_pad, n_cols), jnp.float32),
                   jax.ShapeDtypeStruct((s_pad, n_cols), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_pix) * cfg.samples_per_pixel * 8 * (
                t_pad * 140 + 8 * s_pad * n_cols + 300),
            transcendentals=int(n_pix) * cfg.samples_per_pixel * 8 * 6,
            bytes_accessed=(out_rows * n_slots + 65 * t_pad
                            + 3 * s_pad * n_cols) * 4),
    )(seed, cam, g, mtbl, cdf, lum_row, cos_in, q, visits)

    k = pix_mux
    rad = jnp.stack([out[c * k:(c + 1) * k, :].reshape(-1)[:n_pix]
                     for c in range(3)], axis=1)
    img = (rad / cfg.samples_per_pixel).reshape(cfg.height, cfg.width, 3)
    total = n_pix * cfg.samples_per_pixel
    aux = {"avg_path_length": jnp.sum(out[3 * k, :]) / total,
           "wavefront_iterations": jnp.max(out[3 * k + 1, :]).astype(
               jnp.int32),
           "td_scatter_count": jnp.sum(out[3 * k + 2, :]).astype(jnp.int32)}
    return img, q_out, v_out, aux
