"""Persistent-wavefront expected-SARSA tracer (the fast RL path).

Same learning rule and estimator as integrators.reinforcement_tracer (ref:
GPU_Rendering_Engine/Source/path_tracing/reinforcement_path_tracing.cu:50-120,
radiance_map.cu:91-146), re-organised for TPU throughput the same way
integrators.wavefront re-organises the default tracer:

* sample regeneration + pixel multiplexing: a slot owns pix_mux pixels
  (ids slot + k*n_slots) and starts the next sample / next pixel the moment
  a sample dies, so every iteration's O(W) work (gathers, scatters, NN
  search) is spent on ~live rays instead of a lockstep wavefront's dying
  tail — the lockstep SARSA frame runs bounce_cap iterations at ~10%
  utilisation;
* cascaded drain: once the live count fits in a 4x smaller wavefront the
  loop exits, the (compacted) live prefix is sliced into a smaller state
  and a narrower copy of the same loop continues — the end-of-frame
  straggler tail (up to bounce_cap iterations) runs at 1/4 .. 1/16 of the
  full iteration cost instead of full width (dead slots never revive, so
  the live set is exactly the remaining work);
* compaction happens ONLY at drain boundaries (to make the slice exact):
  permuting the 13 slot fields costs ~13 (W,) gathers + a scatter-set,
  measured ~70 ms at W = 518400 on a v5e — 13x the full-width closest-hit
  sweep per-iteration compaction would save.  Between boundaries the hit
  kernel sweeps up to the last live lane;
* the nearest-volume query is the grid-bucketed bounded-reach search
  (radiance.grid_bucket), O(K) per ray instead of the dense O(V) argmin —
  the dense search alone costs more per bounce than the entire default
  megakernel frame at V ~ 2.5e4;
* the TD bootstrap irradiance is a carried (V,) array refreshed from the
  updated Q grid once per iteration (one fused (V, S) reduction) and read
  per ray with a scalar gather — not a (W, S) row gather;
* sector sampling keeps the (W, S) CDF row gather of volumes.sample_
  from_cdf — a flat-CDF binary search (volumes.sample_from_cdf_bsearch)
  was measured SLOWER at every width on a v5e (log2 S dependent scalar
  gathers serialise worse than one row gather).

Learning semantics are identical to reinforcement_tracer per batch (exact
composition of the running-mean recurrence, volumes.apply_sarsa_
contributions); only the batch boundaries differ — here a batch is "one
wavefront iteration" (mixed bounce depths / samples), there "one bounce of
one lockstep sample".  The reference's atomics interleave updates in
arbitrary hardware order anyway (thesis 4_critical_evaluation.tex:266), so
both are valid serialisations.  Statistical equivalence is tested in
tests/test_sarsa_wavefront.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.integrators.wavefront import _primary_dirs
from rlrpt_tpu.ops import hemisphere as hs
from rlrpt_tpu.ops.intersect_pallas import (closest_hit_mat_mxu,
                                            closest_hit_packed,
                                            pack_scene_mxu, pack_triangles)
from rlrpt_tpu.ops.linalg import make_frame
from rlrpt_tpu.radiance.grid_bucket import (VolumeClassTable, VolumeGrid,
                                            find_closest_volume_grid,
                                            find_closest_volume_table)
from rlrpt_tpu.radiance.volumes import (RadianceVolumes,
                                        apply_sarsa_contributions,
                                        hier_cdf_tables,
                                        irradiance_estimates, rebuild_cdf,
                                        sample_from_cdf_hier,
                                        sample_from_cdf_rows,
                                        sarsa_contributions)
from rlrpt_tpu.scene.scene import Scene

_INF_CUT = jnp.float32(1.0e38)

#: Width divisor between cascaded drain phases and the narrowest phase run.
#: r4 on-chip ablation (tools/sarsa_bench.py --min-drain-w): the floor-4096
#: cascade left a 141-iteration straggler tail at width 16200 (2/3 of all
#: iterations); floor 512 splits it into [27@16200, 22@4050, 101@1012] and
#: took the bench frame 0.577 -> 0.448 s.
_DRAIN_FACTOR = 4
_MIN_DRAIN_W = 512


class _State(NamedTuple):
    # --- per-slot, sliced at each drain step -----------------------------
    o: jnp.ndarray            # (W, 3)
    d: jnp.ndarray            # (W, 3)
    tp: jnp.ndarray           # (W, 3)
    pixel: jnp.ndarray        # (W,) int32 current pixel id
    kmx: jnp.ndarray          # (W,) int32 pixel-multiplex index
    bounce: jnp.ndarray       # (W,) int32
    remaining: jnp.ndarray    # (W,) int32 samples left after current
    active: jnp.ndarray       # (W,) bool
    sample_rad: jnp.ndarray   # (W, 3) radiance of the slot's CURRENT sample
    slot_rad: jnp.ndarray     # (W, pix_mux, 3) finished-sample radiance of
                              # the slot's k-th pixel (flushed to `image`
                              # only at drain boundaries — a per-iteration
                              # pixel scatter serialises on TPU)
    cur_vol: jnp.ndarray      # (W,) int32 volume awaiting a TD target
    cur_sector: jnp.ndarray   # (W,) int32, -1 = no pending update
    cur_brdf: jnp.ndarray     # (W,) f32 previous surface luminance / pi
    # --- global -----------------------------------------------------------
    image: jnp.ndarray        # (n_pix, 3) accumulated finished samples
    cdfplus: jnp.ndarray      # (V, S+1): per-volume CDF rows (constant
                              # within the frame) with the LIVE irradiance
                              # estimate appended as column S — the TD
                              # bootstrap rides the sampler's row gather
                              # (one gather instead of two; gathers are
                              # latency-bound on TPU, ~4-6 ms per 518400
                              # queries whatever the row size)
    path_sum: jnp.ndarray     # scalar f32
    zclp: jnp.ndarray         # scalar int32 zero-contribution paths
    iters: jnp.ndarray        # scalar int32
    td_count: jnp.ndarray     # scalar int32 TD scatters issued (== the
                              # exact visit-count delta, an invariant the
                              # tests assert across schedules)
    vols: RadianceVolumes


_SLOT_FIELDS = ("o", "d", "tp", "pixel", "kmx", "bounce", "remaining",
                "active", "sample_rad", "slot_rad", "cur_vol", "cur_sector",
                "cur_brdf")


def _compact(s: _State, wp: int) -> _State:
    """Permute per-slot fields so live rays form a prefix."""
    act = s.active
    m = jnp.sum(act.astype(jnp.int32))
    arange = jnp.arange(wp, dtype=jnp.int32)
    slot_pos = jnp.where(act, jnp.cumsum(act) - 1, m + jnp.cumsum(~act) - 1)
    perm_src = jnp.zeros((wp,), jnp.int32).at[slot_pos].set(arange)
    return s._replace(**{f: getattr(s, f)[perm_src] for f in _SLOT_FIELDS})


def trace_frame_sarsa_wavefront(key, scene: Scene, camera: Camera,
                                vols: RadianceVolumes, grid: VolumeGrid,
                                cfg: RenderConfig, rl: RadianceVolumeConfig,
                                pix_mux: int = 1, axis_name=None,
                                interpret: bool = False,
                                pix_lo=0, n_pix_local: int | None = None,
                                hit_mode: str = "mxu",
                                sampler: str = "row",
                                frame_mode: str = "hit",
                                drain_factor: int = _DRAIN_FACTOR,
                                min_drain_w: int = _MIN_DRAIN_W,
                                cdf_dtype: str = "f32"):
    """One frame of regenerative SARSA tracing (no CDF rebuild, no jit).

    Returns (image_sum (n_pix_local,3) — SUM over spp, divide by spp for
    the frame —, vols, path_sum, zclp, iters).  Under shard_map
    (`axis_name` set) per-iteration Q contributions are psum'd so each
    device applies the identical update to its replicated Q table, the
    loop condition is made uniform across devices, and the drain cascade
    runs in lockstep (phase exits are psum'd, so every device compacts
    and narrows together).

    pix_lo / n_pix_local carve out the pixel range [pix_lo, pix_lo +
    n_pix_local) for this shard (parallel.dp.render_frame_sarsa_
    wavefront_dp gives each device a contiguous range); single-device
    callers leave the defaults (the whole frame).  pix_lo may be traced
    (e.g. derived from axis_index); n_pix_local must be static.

    cdf_dtype "bf16" stores the carried cdf+irradiance rows in bfloat16,
    halving the per-iteration row gather's bytes.  UNBIASED for the
    image: the sector is drawn by comparing r against the same rounded
    CDF whose hi-lo difference becomes the pdf, so sampling probability
    and pdf agree exactly (a quantised-but-consistent distribution); the
    TD bootstrap irradiance carries bf16 rounding (~0.4%), noise far
    below the learning signal (the reference's updates race, thesis
    4_critical_evaluation.tex:266).
    """
    n_pix = cfg.n_pixels
    n_local = n_pix if n_pix_local is None else n_pix_local
    pix_lo = jnp.int32(pix_lo)
    spp = cfg.samples_per_pixel
    w0 = -(-n_local // pix_mux)        # slots; slot s owns s + k*w0, k<mux
    # hit_mode "mxu": compensated-bf16 MXU matmul sweep that ALSO emits
    # the per-ray material row (normal/diffuse/emission/luminance and the
    # search table's normal-class id), replacing five dynamic gathers;
    # "f32": the exact elementwise Cramer kernel + per-field gathers.
    is_table = isinstance(grid, VolumeClassTable)
    if hit_mode == "mxu":
        g48, m2 = pack_scene_mxu(
            scene, tri_class=grid.tri_class if is_table else None)
    elif hit_mode == "f32":
        tris = pack_triangles(scene)
    else:
        raise ValueError(f"hit_mode must be 'mxu' or 'f32', got {hit_mode!r}")
    if frame_mode not in ("hit", "volume"):
        raise ValueError(f"frame_mode must be 'hit' or 'volume', "
                         f"got {frame_mode!r}")
    ns = scene.n_surfaces
    two_pi_over_s = jnp.float32(2.0 * jnp.pi / vols.n_sectors)

    # sampler "hier": two-level inverse CDF (volumes.hier_cdf_tables) —
    # gathers two G-entry rows per query instead of one S-entry row; the
    # CDF is constant within the frame so the tables derive once here.
    # "row": the reference-shaped flat row sampler.
    if sampler == "hier":
        cdf_c, cdf_f = hier_cdf_tables(vols.cdf, rl.grid_resolution)
    elif sampler != "row":
        raise ValueError(f"sampler must be 'hier' or 'row', got {sampler!r}")

    k_init, k_loop = jax.random.split(key)

    pix0 = pix_lo + jnp.arange(w0, dtype=jnp.int32)
    in_image0 = (pix0 < n_pix) & (pix0 < pix_lo + n_local)
    d0 = _primary_dirs(k_init, pix0, camera, cfg)
    o0 = jnp.broadcast_to(camera.position, d0.shape)
    state = _State(
        o=o0, d=d0, tp=jnp.ones((w0, 3), jnp.float32),
        pixel=pix0, kmx=jnp.zeros((w0,), jnp.int32),
        bounce=jnp.zeros((w0,), jnp.int32),
        remaining=jnp.where(in_image0, spp - 1, 0).astype(jnp.int32),
        active=in_image0,
        sample_rad=jnp.zeros((w0, 3), jnp.float32),
        slot_rad=jnp.zeros((w0, pix_mux, 3), jnp.float32),
        cur_vol=jnp.zeros((w0,), jnp.int32),
        cur_sector=jnp.full((w0,), -1, jnp.int32),
        cur_brdf=jnp.zeros((w0,), jnp.float32),
        image=jnp.zeros((n_local, 3), jnp.float32),
        cdfplus=jnp.concatenate(
            [vols.cdf, irradiance_estimates(vols)[:, None]],
            axis=1).astype(jnp.bfloat16 if cdf_dtype == "bf16"
                           else jnp.float32),
        path_sum=jnp.float32(0.0), zclp=jnp.int32(0), iters=jnp.int32(0),
        td_count=jnp.int32(0),
        vols=vols)

    def make_body(wp: int):

        def body(s: _State):
            k_iter = jax.random.fold_in(k_loop, s.iters)
            if cfg.russian_roulette:
                k_dir, k_cam, k_rr = jax.random.split(k_iter, 3)
            else:
                k_dir, k_cam = jax.random.split(k_iter)

            # NO per-iteration compaction: permuting the 13 slot fields
            # costs ~13 (W,) gathers + a scatter-set — measured ~70 ms at
            # W = 518400 on a v5e, 13x the full-width closest-hit sweep it
            # would save.  Live rays stay in place; the drain cascade (which
            # compacts ONCE at each boundary) handles the end-of-frame tail.
            (o, d, tp, pixel, kmx, bounce, remaining, sample_rad, slot_rad,
             cur_vol, cur_sector, cur_brdf) = (getattr(s, f)
                                               for f in _SLOT_FIELDS
                                               if f != "active")
            act = s.active
            # Tile skipping for the hit kernel still works when the live
            # set has a dead TAIL (post-drain state): sweep up to the last
            # live lane.
            m = wp - jnp.argmax(jnp.flip(act))
            m = jnp.where(jnp.any(act), m, 0).astype(jnp.int32)

            # ---- closest hit up to the last live lane ---------------------
            if hit_mode == "mxu":
                t, tri, mrow = closest_hit_mat_mxu(o, d, g48, m2, m,
                                                   interpret=interpret)
                normal = mrow[:, 0:3]
                diffuse3 = mrow[:, 3:6]
                emission3 = mrow[:, 6:9]
                lum = mrow[:, 10]
                cls = (jnp.round(mrow[:, 11]).astype(jnp.int32)
                       if is_table else None)
            else:
                t, tri = closest_hit_packed(o, d, tris, m,
                                            interpret=interpret)
                normal = scene.normal[tri]
                diffuse3 = scene.diffuse_c[tri]
                emission3 = scene.emission[tri]
                lum = scene.luminance[tri]
                cls = None
            missed = act & (t >= _INF_CUT)
            hit_light = act & ~missed & (tri >= ns)
            hit_surface = act & ~missed & (tri < ns)
            hit_pos = o + t[:, None] * d

            # ---- nearest volume at the new vertex -------------------------
            # (dispatch on the search structure at trace time: the answer
            # table is one 64-byte row gather/ray; the bucket grid gathers
            # a 2 KB candidate row — measured ~80% of the SARSA frame)
            if is_table:
                next_vol = find_closest_volume_table(grid, hit_pos, tri,
                                                     cls=cls)
            else:
                # The grid search filters with a byte-exact f32 normal
                # equality (grid_bucket.py find_closest_volume_grid); the
                # MXU kernel's mat-row normal is a bf16 hi+lo
                # reconstruction (~16 mantissa bits), which would never
                # match on scenes whose normals aren't bf16-exact — gather
                # the true triangle normal for the query (ADVICE r3).
                qnorm = scene.normal[tri] if hit_mode == "mxu" else normal
                next_vol = find_closest_volume_grid(grid, hit_pos, qnorm)

            # ---- fused CDF row + irradiance-bootstrap gather --------------
            # Cast AFTER the gather: the gather moves cdf_dtype bytes; the
            # f32 cast makes the sampler's hi-lo pdf subtraction exact
            # (bf16 values are exactly representable in f32, so pdf ==
            # the true sampling probability — no quantisation bias).
            vrow = s.cdfplus[next_vol].astype(jnp.float32)   # (N, S+1)
            irr_b = vrow[:, -1]

            # ---- TD update of the previously chosen sector ----------------
            # (ref: reinforcement_path_tracing.cu:69-78; targets per hit
            #  type radiance_map.cu:111-146).  Bootstrap irradiance comes
            #  from the carried live (V,) estimates (the ref maintains a
            #  racy incremental accumulator, radiance_volume.cu:94-112).
            target = jnp.where(
                missed, cur_brdf * cfg.environment_light,
                jnp.where(hit_light, cur_brdf * lum,
                          cur_brdf * irr_b))
            pending = act & (cur_sector >= 0)
            # Counted from the PRE-scatter mask, so the visits-delta
            # assertion cross-checks the segment_sum scatter itself.
            td_add = jnp.sum(pending.astype(jnp.int32))
            if axis_name is not None:
                td_add = jax.lax.psum(td_add, axis_name)
            td_count = s.td_count + td_add
            sum_t, cnt = sarsa_contributions(
                cur_vol, jnp.maximum(cur_sector, 0), target, pending,
                s.vols.n_volumes, s.vols.n_sectors)
            if axis_name is not None:
                sum_t = jax.lax.psum(sum_t, axis_name)
                cnt = jax.lax.psum(cnt, axis_name)
            vols_new = apply_sarsa_contributions(s.vols, sum_t, cnt,
                                                 rl.radiance_threshold)
            cdfplus_new = jax.lax.dynamic_update_slice(
                s.cdfplus,
                irradiance_estimates(vols_new)[:, None]
                .astype(s.cdfplus.dtype),
                (0, s.cdfplus.shape[1] - 1))

            # ---- terminal contributions -----------------------------------
            contrib = (jnp.where(missed[:, None],
                                 tp * cfg.environment_light, 0.0)
                       + jnp.where(hit_light[:, None],
                                   tp * emission3, 0.0))
            sample_rad = sample_rad + contrib

            # ---- importance-sample the next direction ---------------------
            # frame_mode "hit": rebuild the hemisphere frame from the hit
            # normal with make_frame (pure math, ~0.7 ms) instead of
            # gathering vols.frame rows (~5.8 ms); identical to the
            # volume's own frame except when the matched volume's class
            # differs from the hit's (fallback matches, ~3% — there the
            # reference samples in the mismatched volume's frame, we
            # sample in the hit surface's, both arbitrary).
            if frame_mode == "hit":
                fr = make_frame(normal)
            else:
                fr = s.vols.frame[next_vol]
            if sampler == "hier":
                new_d, sector, pdf = sample_from_cdf_hier(
                    k_dir, cdf_c, cdf_f, fr, next_vol, rl.grid_rho,
                    rl.grid_resolution)
            else:
                new_d, sector, pdf = sample_from_cdf_rows(
                    k_dir, vrow[:, :-1], fr, rl.grid_rho,
                    rl.grid_resolution)
            cos_theta = jnp.sum(normal * new_d, axis=-1)
            brdf3 = diffuse3 / jnp.pi
            pdf_safe = jnp.maximum(pdf, 1e-12)

            exhausted = hit_surface & (bounce + 1 >= cfg.max_ray_bounces)
            survive = hit_surface & ~exhausted
            tp = jnp.where(survive[:, None],
                           tp * brdf3 * (cos_theta / pdf_safe)[:, None], tp)

            rr_killed = jnp.zeros_like(survive)
            if cfg.russian_roulette:
                p = jnp.clip(jnp.max(tp, axis=-1), cfg.rr_min_prob, 1.0)
                do_rr = survive & (bounce + 1 >= cfg.rr_start_bounce)
                rr_killed = do_rr & (jax.random.uniform(k_rr, (wp,)) >= p)
                tp = jnp.where((do_rr & ~rr_killed)[:, None],
                               tp / p[:, None], tp)
                survive = survive & ~rr_killed

            o = jnp.where(survive[:, None], hit_pos + cfg.eps * new_d, o)
            d = jnp.where(survive[:, None], new_d, d)
            bounce = jnp.where(survive, bounce + 1, bounce)

            # Pending TD state for the next vertex (the sector just
            # sampled; BRDF = this surface's luminance/pi,
            # ref: reinforcement_path_tracing.cu:104-110).
            cur_vol = jnp.where(survive, next_vol, cur_vol)
            cur_sector = jnp.where(survive, sector, -1)
            cur_brdf = jnp.where(survive, lum / jnp.pi, cur_brdf)

            # ---- stats for finished samples -------------------------------
            done = missed | hit_light
            fin = (bounce + 1).astype(jnp.float32)
            path_sum = (s.path_sum
                        + jnp.sum(jnp.where(done, fin, 0.0))
                        + jnp.sum(jnp.where(exhausted,
                                            jnp.float32(cfg.max_ray_bounces),
                                            0.0))
                        + jnp.sum(jnp.where(rr_killed, fin, 0.0)))
            finished = act & ~survive
            zero = finished & (jnp.mean(sample_rad, axis=-1)
                               < cfg.throughput_threshold)
            zclp = s.zclp + jnp.sum(zero.astype(jnp.int32))

            # ---- bank finished samples into the slot's per-k row ----------
            # (elementwise one-hot madd; the image pixel scatter happens
            # only at drain boundaries / end of frame)
            ksel = (jax.lax.broadcasted_iota(jnp.int32, (wp, pix_mux), 1)
                    == kmx[:, None]).astype(jnp.float32)
            slot_rad = slot_rad + (ksel[:, :, None]
                                   * jnp.where(finished[:, None], sample_rad,
                                               0.0)[:, None, :])

            # ---- regeneration: next sample, else next multiplexed pixel ---
            # Pixel stride stays w0 (the FULL slot count) in every phase.
            next_pix = pixel + w0
            step_k = (finished & (remaining <= 0) & (kmx + 1 < pix_mux)
                      & (next_pix < n_pix) & (next_pix < pix_lo + n_local))
            pixel = jnp.where(step_k, next_pix, pixel)
            kmx = jnp.where(step_k, kmx + 1, kmx)
            remaining = jnp.where(step_k, spp, remaining)
            regen = finished & (remaining > 0)
            rd = _primary_dirs(k_cam, pixel, camera, cfg)
            o = jnp.where(regen[:, None], camera.position[None, :], o)
            d = jnp.where(regen[:, None], rd, d)
            tp = jnp.where(regen[:, None], 1.0, tp)
            sample_rad = jnp.where(regen[:, None], 0.0, sample_rad)
            bounce = jnp.where(regen, 0, bounce)
            remaining = jnp.where(regen, remaining - 1, remaining)
            cur_sector = jnp.where(regen, -1, cur_sector)
            active = survive | regen

            return _State(o=o, d=d, tp=tp, pixel=pixel, kmx=kmx,
                          bounce=bounce, remaining=remaining, active=active,
                          sample_rad=sample_rad, slot_rad=slot_rad,
                          cur_vol=cur_vol, cur_sector=cur_sector,
                          cur_brdf=cur_brdf, image=s.image,
                          cdfplus=cdfplus_new,
                          path_sum=path_sum, zclp=zclp, iters=s.iters + 1,
                          td_count=td_count, vols=vols_new)

        return body

    def _flush(image, pixel, kmx, slot_rad):
        """Scatter banked per-slot radiance rows into the image (one add
        per flushed slot-pixel; slot s0's k-th pixel is pix_lo + s0 + k*w0,
        and s0 is recoverable from the slot's CURRENT pixel/kmx)."""
        s0 = pixel - pix_lo - kmx * w0                       # (n,)
        ks = jnp.arange(pix_mux, dtype=jnp.int32)[None, :]
        idx = s0[:, None] + ks * w0                          # (n, mux)
        valid = (idx >= 0) & (idx < n_local)
        flat = jnp.where(valid, idx, n_local).reshape(-1)
        data = jnp.where(valid[..., None], slot_rad, 0.0).reshape(-1, 3)
        return image.at[flat].add(data, mode="drop")

    # Phase widths: w0, w0/4, w0/16, ... (floor _MIN_DRAIN_W).  Dead slots
    # never revive (regeneration happens in the iteration a sample dies),
    # so once live <= next width the sliced prefix carries ALL remaining
    # work.  Under shard_map the phase-exit decision is made UNIFORM by
    # psum'ing the per-device "still wider than the next phase" flag: all
    # devices stay in a phase until EVERY device's live set fits the next
    # width, then all compact+slice together (per-device trip counts can
    # never diverge; a device that drained early just runs its regen-
    # refilled lanes at the wider width until the stragglers catch up).
    widths = [w0]
    while widths[-1] // drain_factor >= min_drain_w:
        widths.append(widths[-1] // drain_factor)

    phase_iters = []
    prev_iters = jnp.int32(0)
    for i, wp in enumerate(widths):
        last = i == len(widths) - 1
        w_next = None if last else widths[i + 1]

        def cond(s: _State, w_next=w_next):
            live = jnp.sum(s.active.astype(jnp.int32))
            stay = live > 0 if w_next is None else live > w_next
            if axis_name is not None:
                stay = jax.lax.psum(stay.astype(jnp.int32), axis_name) > 0
            return stay

        state = jax.lax.while_loop(cond, make_body(wp), state)
        phase_iters.append(state.iters - prev_iters)
        prev_iters = state.iters
        if not last:
            state = _compact(state, wp)
            # The tail [w_next:] is all-dead (live <= w_next and live rays
            # are compacted to the front) — flush its banked radiance
            # before slicing it away.
            image = _flush(state.image, state.pixel[w_next:],
                           state.kmx[w_next:], state.slot_rad[w_next:])
            state = state._replace(
                image=image,
                **{f: getattr(state, f)[:w_next] for f in _SLOT_FIELDS})

    image = _flush(state.image, state.pixel, state.kmx, state.slot_rad)
    return (image, state.vols, state.path_sum, state.zclp, state.iters,
            state.td_count, jnp.stack(phase_iters), tuple(widths))


@partial(jax.jit, static_argnames=("cfg", "rl", "pix_mux", "interpret",
                                   "hit_mode", "sampler", "frame_mode",
                                   "drain_factor", "min_drain_w",
                                   "cdf_dtype"))
def render_frame_sarsa_wavefront(key, scene: Scene, camera: Camera,
                                 vols: RadianceVolumes, grid: VolumeGrid,
                                 cfg: RenderConfig, rl: RadianceVolumeConfig,
                                 pix_mux: int = 1, interpret: bool = False,
                                 hit_mode: str = "mxu",
                                 sampler: str = "row",
                                 frame_mode: str = "hit",
                                 drain_factor: int = _DRAIN_FACTOR,
                                 min_drain_w: int = _MIN_DRAIN_W,
                                 cdf_dtype: str = "f32"):
    """Render one frame while learning; returns (image, volumes, aux).

    Drop-in fast replacement for reinforcement_tracer.render_frame_sarsa:
    same aux keys (avg_path_length, zero_contribution_light_paths), same
    per-frame CDF rebuild at the end (ref: main.cu:342-344).
    """
    image_sum, vols, path_sum, zclp, iters, td_count, phase_iters, widths = \
        trace_frame_sarsa_wavefront(
            key, scene, camera, vols, grid, cfg, rl, pix_mux=pix_mux,
            interpret=interpret, hit_mode=hit_mode, sampler=sampler,
            frame_mode=frame_mode, drain_factor=drain_factor,
            min_drain_w=min_drain_w, cdf_dtype=cdf_dtype)
    vols = rebuild_cdf(vols, rl.distribution_threshold,
                       rl.defensive_mix)
    total = cfg.n_pixels * cfg.samples_per_pixel
    img = (image_sum / cfg.samples_per_pixel).reshape(
        cfg.height, cfg.width, 3)
    aux = {"avg_path_length": path_sum / total,
           "zero_contribution_light_paths": zclp,
           "wavefront_iterations": iters,
           "td_scatter_count": td_count,
           "phase_iterations": phase_iters,
           "phase_widths": widths}
    return img, vols, aux
