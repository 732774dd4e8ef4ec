"""Persistent-wavefront default path tracer (the fast path).

Same estimator as integrators.default_tracer (ref:
GPU_Rendering_Engine/Source/path_tracing/default_path_tracing.cu:36-88),
re-organised for TPU throughput:

* one ray slot per pixel; a slot re-traces ITS pixel's next sample the
  moment the previous one terminates ("sample regeneration") —
  utilisation stays ~100% instead of waiting out the longest path of every
  spp round (a naive lockstep wavefront wastes bounce_cap / avg_path ≈ 10x
  on the reference's 80-bounce config);
* **no per-bounce compaction**: the Pallas closest-hit kernel sweeps up
  to the last live lane each bounce (a high-water mark, cheap to track)
  and frame assembly is a plain reshape — the earlier cumsum-scatter
  compaction permutation measured slower than the sweep it saved once
  sample regeneration keeps lanes dense (commit 487bed4);
* radiance accumulates **per slot** (pure elementwise) and is scattered to
  pixels ONCE per frame — a per-bounce segment_sum scatter measured 21 ms
  (it serialises on TPU) vs <0.1 ms for everything else in the loop;
* RNG is drawn per iteration for the whole wavefront (one threefry call
  for (W, k) uniforms) — per-ray fold_in key chains cost ~1M hashes per
  bounce and measured 80x slower than the rest of the loop combined.  The
  image is deterministic for a base key; per-sample bitwise
  reproducibility across schedules is not preserved (the reference's
  cuRAND sequences aren't reproducible either, SURVEY §7 "RNG parity").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlrpt_tpu.camera import Camera, rotate_dirs
from rlrpt_tpu.config import RHO, RenderConfig
from rlrpt_tpu.ops.hemisphere import sample_uniform_direction
from rlrpt_tpu.ops.intersect_pallas import (closest_hit_mat_mxu,
                                            closest_hit_packed,
                                            pack_scene_mxu, pack_triangles)
from rlrpt_tpu.scene.scene import Scene

_INF_CUT = jnp.float32(1.0e38)


class _WaveState(NamedTuple):
    o: jnp.ndarray          # (W, 3)
    d: jnp.ndarray          # (W, 3)
    tp: jnp.ndarray         # (W, 3) current sample's throughput
    pixel: jnp.ndarray      # (W,) int32 pixel id of the slot
    bounce: jnp.ndarray     # (W,) int32 bounces taken by the current sample
    remaining: jnp.ndarray  # (W,) int32 samples left for this pixel AFTER
                            # the current one
    active: jnp.ndarray     # (W,) bool
    slot_rad: jnp.ndarray   # (W, 3) accumulated radiance of the slot's pixel
    path_sum: jnp.ndarray   # scalar float32: sum of finished path lengths
    iters: jnp.ndarray      # scalar int32


def _primary_dirs(key, pixel, camera: Camera, cfg: RenderConfig):
    """Jittered primary ray directions for pixel ids (ref: ray.cu:145-159)."""
    px = (pixel % cfg.width).astype(jnp.float32)
    py = (pixel // cfg.width).astype(jnp.float32)
    u = jax.random.uniform(key, pixel.shape + (2,), dtype=jnp.float32)
    d = jnp.stack([px + u[..., 0] - cfg.width / 2.0,
                   py + u[..., 1] - cfg.height / 2.0,
                   jnp.full_like(px, cfg.focal)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return rotate_dirs(d, camera.yaw_y, camera.yaw_x)


@partial(jax.jit, static_argnames=("cfg", "interpret", "hit_mode"))
def render_wavefront(key, scene: Scene, camera: Camera, cfg: RenderConfig,
                     interpret: bool = False, hit_mode: str = "mxu"):
    """Render a frame; returns (image (H,W,3), aux) — statistically
    identical to render_default at the same sample budget."""
    n_pix = cfg.n_pixels
    w = n_pix
    spp = cfg.samples_per_pixel
    total = n_pix * spp
    # hit_mode "mxu": compensated-bf16 MXU matmul sweep (the megakernel's
    # formulation; ~1.5e-5 relative on the matmul entries, estimator bias
    # at the MC noise floor per tools/precision_check.py); "f32": the exact
    # elementwise Cramer kernel.
    if hit_mode == "mxu":
        g48, m2 = pack_scene_mxu(scene)
    elif hit_mode == "f32":
        tris = pack_triangles(scene)
    else:
        raise ValueError(f"hit_mode must be 'mxu' or 'f32', got {hit_mode!r}")
    ns = scene.n_surfaces
    arange_w = jnp.arange(w, dtype=jnp.int32)

    k_init, k_loop = jax.random.split(key)

    pix0 = arange_w
    d0 = _primary_dirs(k_init, pix0, camera, cfg)
    o0 = jnp.broadcast_to(camera.position, d0.shape)
    init = _WaveState(
        o=o0, d=d0, tp=jnp.ones((w, 3), jnp.float32),
        pixel=pix0, bounce=jnp.zeros((w,), jnp.int32),
        remaining=jnp.full((w,), spp - 1, jnp.int32),
        active=jnp.ones((w,), bool),
        slot_rad=jnp.zeros((w, 3), jnp.float32),
        path_sum=jnp.float32(0.0), iters=jnp.int32(0))

    def cond(s: _WaveState):
        return jnp.any(s.active)

    def body(s: _WaveState):
        k_iter = jax.random.fold_in(k_loop, s.iters)
        # RR key drawn only when enabled (static branch) so RR-off renders
        # keep the pre-RR threefry stream bitwise (ADVICE r1).
        if cfg.russian_roulette:
            k_dir, k_cam, k_rr = jax.random.split(k_iter, 3)
        else:
            k_dir, k_cam = jax.random.split(k_iter)

        # NO per-iteration compaction: permuting the slot fields costs
        # ~7 (W,) gathers + a scatter-set — measured ~5 ms per (W,) gather
        # at W = 518400 on a v5e, far more than the full-width closest-hit
        # sweep it would save.  The hit kernel still skips tiles past the
        # last live lane (with sample regeneration, deaths scatter but the
        # tail drains from the back as slots exhaust their budget).
        act = s.active
        o, d, tp, pixel, bounce, remaining, slot_rad = (
            s.o, s.d, s.tp, s.pixel, s.bounce, s.remaining, s.slot_rad)
        m = w - jnp.argmax(jnp.flip(act))
        m = jnp.where(jnp.any(act), m, 0).astype(jnp.int32)

        # ---- closest hit up to the last live lane -----------------------
        # mxu mode: the kernel emits the packed material row, replacing
        # four small-table gathers — every dynamic gather is ~4-6 ms per
        # 518400 lanes on TPU (latency-bound), more than the sweep itself.
        if hit_mode == "mxu":
            t, tri, mrow = closest_hit_mat_mxu(o, d, g48, m2, m,
                                               interpret=interpret)
            emission = mrow[:, 6:9]
            normal = mrow[:, 0:3]
            diffuse = mrow[:, 3:6]
        else:
            t, tri = closest_hit_packed(o, d, tris, m, interpret=interpret)
            emission = scene.emission[tri]
            normal = scene.normal[tri]
            diffuse = scene.diffuse_c[tri]
        missed = act & (t >= _INF_CUT)
        hit_light = act & ~missed & (tri >= ns)
        hit_surface = act & ~missed & (tri < ns)

        # ---- terminal contributions (per slot, elementwise) -------------
        contrib = (jnp.where(missed[:, None], tp * cfg.environment_light, 0.0)
                   + jnp.where(hit_light[:, None], tp * emission,
                               0.0))
        slot_rad = slot_rad + contrib

        # ---- diffuse bounce for survivors ------------------------------
        exhausted = hit_surface & (bounce + 1 >= cfg.max_ray_bounces)
        survive = hit_surface & ~exhausted
        new_d, cos_theta = sample_uniform_direction(k_dir, normal)
        brdf = diffuse / jnp.pi
        pos3 = o + t[:, None] * d
        tp = jnp.where(survive[:, None],
                       tp * brdf * (cos_theta[:, None] / RHO), tp)

        # Optional unbiased Russian roulette (config.RenderConfig docstring):
        # kill deep low-throughput survivors, reweight the continuers.
        rr_killed = jnp.zeros_like(survive)
        if cfg.russian_roulette:
            p = jnp.clip(jnp.max(tp, axis=-1), cfg.rr_min_prob, 1.0)
            do_rr = survive & (bounce + 1 >= cfg.rr_start_bounce)
            rr_killed = do_rr & (jax.random.uniform(k_rr, (w,)) >= p)
            tp = jnp.where((do_rr & ~rr_killed)[:, None], tp / p[:, None], tp)
            survive = survive & ~rr_killed

        o = jnp.where(survive[:, None], pos3 + cfg.eps * new_d, o)
        d = jnp.where(survive[:, None], new_d, d)
        bounce = jnp.where(survive, bounce + 1, bounce)

        # ---- stats: finished path lengths ------------------------------
        done = missed | hit_light
        fin = (bounce + 1).astype(jnp.float32)
        path_sum = (s.path_sum
                    + jnp.sum(jnp.where(done, fin, 0.0))
                    + jnp.sum(jnp.where(exhausted,
                                        jnp.float32(cfg.max_ray_bounces), 0.0))
                    + jnp.sum(jnp.where(rr_killed, fin, 0.0)))

        # ---- regeneration: next sample of the SAME pixel ----------------
        free = act & ~survive
        regen = free & (remaining > 0)
        rd = _primary_dirs(k_cam, pixel, camera, cfg)
        o = jnp.where(regen[:, None], camera.position[None, :], o)
        d = jnp.where(regen[:, None], rd, d)
        tp = jnp.where(regen[:, None], 1.0, tp)
        bounce = jnp.where(regen, 0, bounce)
        remaining = jnp.where(regen, remaining - 1, remaining)
        active = survive | regen

        return _WaveState(o=o, d=d, tp=tp, pixel=pixel, bounce=bounce,
                          remaining=remaining, active=active,
                          slot_rad=slot_rad, path_sum=path_sum,
                          iters=s.iters + 1)

    final = jax.lax.while_loop(cond, body, init)
    # Slots are never permuted (no compaction), so slot i IS pixel i and
    # the frame assembly is a plain reshape — no scatter at all.
    img = (final.slot_rad / spp).reshape(cfg.height, cfg.width, 3)
    aux = {"avg_path_length": final.path_sum / total,
           "wavefront_iterations": final.iters}
    return img, aux
