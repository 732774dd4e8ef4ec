"""Megakernel (interpret mode) vs the reference-shaped default tracer.

The Pallas megakernel must implement the SAME estimator as
integrators.default_tracer (ref: default_path_tracing.cu:36-88): identical
per-event probabilities and throughput algebra, different RNG consumption
order — so images match statistically, not bitwise (SURVEY §7 RNG parity).
"""

import jax
import numpy as np
import pytest

from rlrpt_tpu import config
from rlrpt_tpu.camera import Camera
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.ops.megakernel import render_default_mega
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.scene.presets import get as get_preset


@pytest.fixture(scope="module")
def renders():
    cfg = config.RenderConfig(width=32, height=32, samples_per_pixel=8,
                              max_ray_bounces=10, ray_tile=1024)
    scene = cornell_box()
    cam = Camera.create(get_preset("cornell").camera_position)
    img_m, aux_m = render_default_mega(
        jax.random.PRNGKey(0), scene, cam, cfg, r_tile=128, pix_mux=4,
        interpret=True)
    img_d, aux_d = render_default(jax.random.PRNGKey(7), scene, cam, cfg)
    return np.asarray(img_m), aux_m, np.asarray(img_d), aux_d


def test_finite_and_lit(renders):
    img_m, aux_m, _, _ = renders
    assert np.isfinite(img_m).all()
    assert img_m.min() >= 0.0
    assert img_m.max() > 0.05


def test_mean_brightness_matches_default(renders):
    img_m, _, img_d, _ = renders
    # 8 spp at 32x32: the frame-mean MC error is far below 10%.
    assert abs(img_m.mean() - img_d.mean()) < 0.1 * max(img_d.mean(), 1e-6)


def test_avg_path_length_matches_default(renders):
    _, aux_m, _, aux_d = renders
    apl_m = float(aux_m["avg_path_length"])
    apl_d = float(aux_d["avg_path_length"])
    assert abs(apl_m - apl_d) < 0.5


def test_pixel_mapping_no_holes(renders):
    # Every pixel must receive its spp samples: with pixel multiplexing a
    # mis-mapped slot->pixel unpack leaves dark holes / doubled pixels.
    # The Cornell interior has no pixel with zero radiance at 8 spp except
    # possibly a handful of unlucky ones.
    img_m, _, img_d, _ = renders
    dark_m = int((img_m.max(axis=-1) == 0.0).sum())
    dark_d = int((img_d.max(axis=-1) == 0.0).sum())
    assert dark_m <= dark_d + 25


def test_multichunk_matches_single_chunk(monkeypatch):
    """The streaming one-pass multi-chunk argmin must produce the exact
    same image as the single-chunk sweep (same RNG stream — the chunking
    only changes how the intersection reduction is tiled)."""
    import rlrpt_tpu.ops.megakernel as mk

    cfg = config.RenderConfig(width=24, height=24, samples_per_pixel=4,
                              max_ray_bounces=8, ray_tile=1024)
    scene = cornell_box()
    cam = Camera.create(get_preset("cornell").camera_position)
    img_one, _ = render_default_mega(jax.random.PRNGKey(5), scene, cam, cfg,
                                     r_tile=128, pix_mux=8, interpret=True)
    monkeypatch.setattr(mk, "T_CHUNK", 32)   # 38 tris -> 2 chunks of 32
    # T_CHUNK is read at trace time; drop the jit cache so the patched
    # value actually re-traces (same static args would otherwise hit it).
    jax.clear_caches()
    n_tris = scene.v0.shape[0]
    padded = mk._t_pad(n_tris)
    assert padded > mk.T_CHUNK and padded % mk.T_CHUNK == 0  # genuinely multi-chunk
    img_multi, _ = mk.render_default_mega(jax.random.PRNGKey(5), scene, cam,
                                          cfg, r_tile=128, pix_mux=8,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(img_multi), np.asarray(img_one),
                               rtol=1e-5, atol=1e-6)


def test_aabb_cull_bitwise_identical(monkeypatch):
    """The AABB pre-reject must be CONSERVATIVE: with chunks forced small
    (cornell -> multiple chunks), cull=True and cull=False must produce
    bitwise-identical images (a skipped chunk is one no live lane could
    have hit closer than its current best)."""
    import rlrpt_tpu.ops.megakernel as mk

    monkeypatch.setattr(mk, "T_CHUNK", 16)   # 38 tris -> 3 chunks of 16
    jax.clear_caches()
    scene = cornell_box().to_device()
    cam = Camera.create([0.0, 0.0, -3.0])
    cfg = config.RenderConfig(width=32, height=32, samples_per_pixel=4,
                              max_ray_bounces=6)
    img_on, aux_on = mk.render_default_mega(
        jax.random.PRNGKey(9), scene, cam, cfg, r_tile=256, pix_mux=2,
        interpret=True, cull=True)
    img_off, aux_off = mk.render_default_mega(
        jax.random.PRNGKey(9), scene, cam, cfg, r_tile=256, pix_mux=2,
        interpret=True, cull=False)
    jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(img_on), np.asarray(img_off))
    assert int(aux_on["wavefront_iterations"]) == \
        int(aux_off["wavefront_iterations"])
