"""Persistent-wavefront default path tracer (the fast path).

Same estimator as integrators.default_tracer (ref:
GPU_Rendering_Engine/Source/path_tracing/default_path_tracing.cu:36-88),
re-organised for TPU throughput:

* ONE ray slot pool for the whole frame with **sample regeneration**: when a
  ray terminates, its slot immediately pulls the next (pixel, sample) from
  the frame's queue — utilisation stays ~100% instead of waiting out the
  longest path of every spp round (the naive wavefront wastes
  (bounce_cap / avg_path) ≈ 10x on the reference's 80-bounce config);
* **compaction** each bounce: a cumsum-scatter permutation (O(W), no sort)
  packs live rays to the front so the Pallas closest-hit kernel
  (ops.intersect_pallas) only sweeps ceil(live / R_TILE) tiles — this is
  what drains the end-of-frame tail cheaply;
* radiance lands in a per-pixel accumulator via deterministic segment_sum;
* RNG is drawn per *iteration* for the whole wavefront (one threefry call
  for (W, k) uniforms) — per-ray fold_in key chains cost ~1M hashes per
  bounce and measured 80x slower than the whole rest of the loop.  The
  image is still deterministic for a base key; per-sample bitwise
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
from rlrpt_tpu.ops.intersect_pallas import closest_hit_packed, pack_triangles
from rlrpt_tpu.scene.scene import Scene

_INF_CUT = jnp.float32(1.0e38)


class _WaveState(NamedTuple):
    o: jnp.ndarray          # (W, 3)
    d: jnp.ndarray          # (W, 3)
    tp: jnp.ndarray         # (W, 3) throughput
    pixel: jnp.ndarray      # (W,) int32 pixel id
    bounce: jnp.ndarray     # (W,) int32 bounces taken so far
    active: jnp.ndarray     # (W,) bool
    next_sample: jnp.ndarray  # scalar int32: next queue entry
    radiance: jnp.ndarray   # (n_pixels, 3) accumulator
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


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_wavefront(key, scene: Scene, camera: Camera, cfg: RenderConfig,
                     interpret: bool = False):
    """Render a frame; returns (image (H,W,3), aux) — statistically
    identical to render_default at the same sample budget."""
    n_pix = cfg.n_pixels
    w = n_pix  # slot count = one slot per pixel
    total = n_pix * cfg.samples_per_pixel
    tris = pack_triangles(scene)
    ns = scene.n_surfaces
    arange_w = jnp.arange(w, dtype=jnp.int32)

    k_init, k_loop = jax.random.split(key)

    sid0 = arange_w
    pix0 = sid0 % n_pix
    d0 = _primary_dirs(k_init, pix0, camera, cfg)
    o0 = jnp.broadcast_to(camera.position, d0.shape)
    init = _WaveState(
        o=o0, d=d0, tp=jnp.ones((w, 3), jnp.float32),
        pixel=pix0, bounce=jnp.zeros((w,), jnp.int32),
        active=sid0 < total,
        next_sample=jnp.int32(min(w, total)),
        radiance=jnp.zeros((n_pix, 3), jnp.float32),
        path_sum=jnp.float32(0.0), iters=jnp.int32(0))

    def cond(s: _WaveState):
        return jnp.any(s.active)

    def body(s: _WaveState):
        k_iter = jax.random.fold_in(k_loop, s.iters)
        k_dir, k_cam = jax.random.split(k_iter)

        # ---- compaction: live rays to the front ------------------------
        act = s.active
        m = jnp.sum(act.astype(jnp.int32))
        pos = jnp.where(act, jnp.cumsum(act) - 1,
                        m + jnp.cumsum(~act) - 1)           # target slot
        perm_src = jnp.zeros((w,), jnp.int32).at[pos].set(arange_w)
        o, d, tp, pixel, bounce = (a[perm_src] for a in
                                   (s.o, s.d, s.tp, s.pixel, s.bounce))
        act = arange_w < m

        # ---- closest hit on the live prefix only ------------------------
        t, tri = closest_hit_packed(o, d, tris, m, interpret=interpret)
        missed = act & (t >= _INF_CUT)
        hit_light = act & ~missed & (tri >= ns)
        hit_surface = act & ~missed & (tri < ns)

        # ---- terminal contributions ------------------------------------
        contrib = (jnp.where(missed[:, None], tp * cfg.environment_light, 0.0)
                   + jnp.where(hit_light[:, None], tp * scene.emission[tri],
                               0.0))
        radiance = s.radiance + jax.ops.segment_sum(contrib, pixel,
                                                    num_segments=n_pix)

        # ---- diffuse bounce for survivors ------------------------------
        exhausted = hit_surface & (bounce + 1 >= cfg.max_ray_bounces)
        survive = hit_surface & ~exhausted
        normal = scene.normal[tri]
        new_d, cos_theta = sample_uniform_direction(k_dir, normal)
        brdf = scene.diffuse_c[tri] / jnp.pi
        pos3 = o + t[:, None] * d
        tp_new = jnp.where(survive[:, None],
                           tp * brdf * (cos_theta[:, None] / RHO), tp)
        o_new = jnp.where(survive[:, None], pos3 + cfg.eps * new_d, o)
        d_new = jnp.where(survive[:, None], new_d, d)
        bounce_new = jnp.where(survive, bounce + 1, bounce)

        # ---- stats: finished path lengths ------------------------------
        done = missed | hit_light
        path_sum = (s.path_sum
                    + jnp.sum(jnp.where(done, (bounce + 1).astype(jnp.float32),
                                        0.0))
                    + jnp.sum(jnp.where(exhausted,
                                        jnp.float32(cfg.max_ray_bounces), 0.0)))

        # ---- regeneration: refill freed slots from the sample queue ----
        def regen(args):
            o_new, d_new, tp_new, pixel, bounce_new = args
            free = act & ~survive
            rank = jnp.cumsum(free.astype(jnp.int32)) - 1
            new_sid = s.next_sample + rank
            take = free & (new_sid < total)
            n_taken = jnp.sum(take.astype(jnp.int32))
            rpix = jnp.where(take, new_sid % n_pix, 0)
            rd = _primary_dirs(k_cam, rpix, camera, cfg)
            ro = jnp.broadcast_to(camera.position, rd.shape)
            return (jnp.where(take[:, None], ro, o_new),
                    jnp.where(take[:, None], rd, d_new),
                    jnp.where(take[:, None], 1.0, tp_new),
                    jnp.where(take, rpix, pixel),
                    jnp.where(take, 0, bounce_new),
                    survive | take, n_taken)

        def no_regen(args):
            o_new, d_new, tp_new, pixel, bounce_new = args
            return (o_new, d_new, tp_new, pixel, bounce_new, survive,
                    jnp.int32(0))

        (o_new, d_new, tp_new, pixel, bounce_new, active,
         n_taken) = jax.lax.cond(s.next_sample < total, regen, no_regen,
                                 (o_new, d_new, tp_new, pixel, bounce_new))

        return _WaveState(o=o_new, d=d_new, tp=tp_new, pixel=pixel,
                          bounce=bounce_new, active=active,
                          next_sample=s.next_sample + n_taken,
                          radiance=radiance, path_sum=path_sum,
                          iters=s.iters + 1)

    final = jax.lax.while_loop(cond, body, init)
    img = (final.radiance / cfg.samples_per_pixel).reshape(
        cfg.height, cfg.width, 3)
    aux = {"avg_path_length": final.path_sum / total,
           "wavefront_iterations": final.iters}
    return img, aux
