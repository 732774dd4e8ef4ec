"""Persistent-wavefront tracer: statistical parity with the reference-shaped
default tracer, and the Pallas kernel against the XLA intersection path."""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera, primary_rays
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.integrators.wavefront import render_wavefront
from rlrpt_tpu.ops.intersect import closest_hit
from rlrpt_tpu.ops.intersect_pallas import closest_hit_packed, pack_triangles
from rlrpt_tpu.scene import cornell_box

_CFG = RenderConfig(width=48, height=48, samples_per_pixel=8,
                    max_ray_bounces=8, ray_tile=2048)


def test_pallas_kernel_matches_xla_path():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    o, d = primary_rays(jax.random.PRNGKey(0), cam, 40, 40, 40.0)
    tris = pack_triangles(scene)
    t_p, i_p = closest_hit_packed(o, d, tris, o.shape[0], interpret=True)
    ref = closest_hit(o, d, scene)
    t_r = np.asarray(ref.t)
    hit = t_r < 1e38
    np.testing.assert_allclose(np.asarray(t_p)[hit], t_r[hit], rtol=1e-5,
                               atol=1e-5)
    assert (np.asarray(i_p)[hit] == np.asarray(ref.tri)[hit]).all()
    assert ((np.asarray(t_p) >= 1e38) == ~hit).all()


def test_mxu_kernel_matches_f32_kernel():
    """The compensated-bf16 MXU sweep agrees with the exact kernel on
    hit/miss and triangle choice away from grazing ties; t carries the
    compensated error (amplified by near-zero determinants on grazing
    rays — estimator-level bias is gated on-chip by precision_check)."""
    from rlrpt_tpu.ops.intersect_pallas import (closest_hit_packed_mxu,
                                                pack_triangles_mxu)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    o, d = primary_rays(jax.random.PRNGKey(0), cam, 40, 40, 40.0)
    t0, i0 = closest_hit_packed(o, d, pack_triangles(scene), o.shape[0],
                                interpret=True)
    t1, i1 = closest_hit_packed_mxu(o, d, pack_triangles_mxu(scene),
                                    o.shape[0], interpret=True)
    t0, i0, t1, i1 = map(np.asarray, (t0, i0, t1, i1))
    hit0, hit1 = t0 < 1e38, t1 < 1e38
    assert (hit0 == hit1).mean() > 0.999
    same = hit0 & hit1 & (i0 == i1)
    assert same.mean() > 0.98
    rel = np.abs(t1[same] - t0[same]) / np.maximum(t0[same], 1e-3)
    assert np.median(rel) < 1e-4


def test_wavefront_mxu_hits_match_f32_image():
    """Image-level gate for hit_mode='mxu' (the integrator default): the
    perturbed intersections reshuffle RNG per ray, so images agree in
    distribution — compare pixel means over the same budget."""
    import dataclasses
    cfg = dataclasses.replace(_CFG, samples_per_pixel=32)
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    img_m, _ = render_wavefront(jax.random.PRNGKey(3), scene, cam, cfg,
                                interpret=True, hit_mode="mxu")
    img_f, _ = render_wavefront(jax.random.PRNGKey(4), scene, cam, cfg,
                                interpret=True, hit_mode="f32")
    m, f = np.asarray(img_m), np.asarray(img_f)
    # different seeds: the bound sits above the 32-spp seed-noise floor
    # (~3% on the frame mean at this size)
    assert abs(m.mean() - f.mean()) / f.mean() < 0.06
    # same-scene structure: column-mean profiles correlate strongly
    pm, pf = m.mean(axis=(0, 2)), f.mean(axis=(0, 2))
    r = np.corrcoef(pm, pf)[0, 1]
    assert r > 0.95


def test_pallas_kernel_active_count_masks():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    o, d = primary_rays(jax.random.PRNGKey(0), cam, 40, 40, 40.0)
    tris = pack_triangles(scene)
    t_m, _ = closest_hit_packed(o, d, tris, 100, interpret=True)
    t_m = np.asarray(t_m)
    # the first tile (512 rays) computes; everything past it is masked out
    assert (t_m[512:] >= 1e38).all()
    assert (t_m[:100] < 1e38).any()


def test_wavefront_matches_default_statistically():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    img_w, aux_w = render_wavefront(jax.random.PRNGKey(0), scene, cam, _CFG,
                                    interpret=True)
    img_d, aux_d = render_default(jax.random.PRNGKey(1), scene, cam, _CFG)
    a, b = np.asarray(img_w), np.asarray(img_d)
    assert a.shape == b.shape and np.isfinite(a).all()
    # same estimator, different RNG stream: mean brightness and avg path
    # must agree within MC noise
    assert abs(a.mean() - b.mean()) < 0.2 * max(b.mean(), 1e-3)
    assert abs(float(aux_w["avg_path_length"])
               - float(aux_d["avg_path_length"])) < 0.5
    # regeneration bound: iterations <= spp * bounce_cap (equality only if
    # some pixel exhausts the bounce budget on every sample)
    assert int(aux_w["wavefront_iterations"]) <= (
        _CFG.samples_per_pixel * _CFG.max_ray_bounces)
