"""Guided (frozen-map) megakernel + bake tests.

The load-bearing property is pdf CONSISTENCY: the guided kernel importance
samples an arbitrary baked distribution, so the image mean must match the
default tracer's for ANY table (unbiasedness), not just look plausible.
Both the uniform-table and trained-table cases are checked against the
default megakernel (an independently tested estimator).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.ops.guided_mega import render_guided_mega
from rlrpt_tpu.ops.megakernel import mt_tables, render_default_mega
from rlrpt_tpu.radiance.bake import (TriBinCDF, bake_tri_bin_cdf,
                                     rebin_sector_pmf)
from rlrpt_tpu.radiance.volumes import build_radiance_volumes, rebuild_cdf
from rlrpt_tpu.scene import cornell_box


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box().to_device()
    cam = Camera.create([0.0, 0.0, -3.0])
    rl = RadianceVolumeConfig(area_per_sample=0.01)
    vols = rebuild_cdf(build_radiance_volumes(scene, rl))
    g, _ = mt_tables(scene)
    t_pad = g.shape[0] // 4
    return scene, cam, rl, vols, t_pad


def test_rebin_conserves_mass():
    rng = np.random.default_rng(0)
    pmf = rng.random((5, 144))
    pmf /= pmf.sum(axis=1, keepdims=True)
    out = rebin_sector_pmf(pmf, 12, 11)
    assert out.shape == (5, 121)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-12)
    # identity when grids match
    assert rebin_sector_pmf(pmf, 12, 12) is pmf


def test_bake_table_shape_and_monotonicity(setup):
    scene, cam, rl, vols, t_pad = setup
    tb = bake_tri_bin_cdf(scene, vols, rl, t_pad, uv_bins=4, sector_grid=11)
    s_pad, c = tb.cdf.shape
    assert s_pad == 128 and c == t_pad * 16
    cdf = np.asarray(tb.cdf, np.float32)
    rows = cdf[:121]
    assert (np.diff(rows, axis=0) >= -1e-6).all(), "CDF columns not monotone"
    # top of every real CDF reaches 1 (bf16-rounded)
    np.testing.assert_allclose(rows[120], 1.0, atol=4e-3)
    assert (cdf[121:] == 2.0).all(), "padding sentinel rows must be 2.0"


def test_bake_rejects_mismatched_map(setup):
    scene, cam, rl, vols, t_pad = setup
    other_rl = RadianceVolumeConfig(area_per_sample=0.02)
    with pytest.raises(ValueError, match="volume_counts"):
        bake_tri_bin_cdf(scene, vols, other_rl, t_pad)


def test_guided_rejects_wrong_t_pad(setup):
    scene, cam, rl, vols, t_pad = setup
    tb = bake_tri_bin_cdf(scene, vols, rl, t_pad + 8, uv_bins=2)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1,
                       max_ray_bounces=2)
    with pytest.raises(ValueError, match="t_pad"):
        render_guided_mega(jax.random.PRNGKey(0), scene, cam, tb, cfg,
                           r_tile=256, pix_mux=1, interpret=True)


def _mean_close(img_a, img_b, rtol):
    ma, mb = float(np.mean(img_a)), float(np.mean(img_b))
    assert abs(ma - mb) / max(mb, 1e-9) < rtol, (ma, mb)


def test_guided_uniform_table_matches_default(setup):
    """Untrained map -> uniform sector pmf -> (equal-solid-angle sectors +
    in-sector jitter) == uniform hemisphere sampling: the guided kernel
    must reproduce the default megakernel's image in distribution."""
    scene, cam, rl, vols, t_pad = setup
    tb = bake_tri_bin_cdf(scene, vols, rl, t_pad, uv_bins=2, sector_grid=11)
    cfg = RenderConfig(width=48, height=48, samples_per_pixel=8,
                       max_ray_bounces=6)
    k = jax.random.PRNGKey(3)
    img_g, aux_g = render_guided_mega(k, scene, cam, tb, cfg, r_tile=512,
                                      pix_mux=2, interpret=True)
    img_d, aux_d = render_default_mega(k, scene, cam, cfg, r_tile=512,
                                       pix_mux=2, interpret=True)
    assert np.isfinite(np.asarray(img_g)).all()
    _mean_close(img_g, img_d, 0.06)
    # same sampling distribution -> same path-length statistics
    assert abs(float(aux_g["avg_path_length"])
               - float(aux_d["avg_path_length"])) < 0.5


def test_guided_trained_table_unbiased(setup):
    """A sharply non-uniform table must leave the image mean unchanged
    (pdf == actual sampling probability for every sector).  Train-like
    tables are emulated by re-weighting the baked pmf toward each
    volume's max-Q sector; any error in the hi/lo/pdf algebra shows up
    as a mean shift far beyond MC noise."""
    scene, cam, rl, vols, t_pad = setup
    # Skew the per-volume q so the baked pmf is strongly non-uniform.
    import dataclasses

    rng = np.random.default_rng(5)
    q = np.asarray(vols.q)
    skew = np.exp(3.0 * rng.random(q.shape).astype(np.float32))
    vols_skew = rebuild_cdf(
        dataclasses.replace(vols, q=jnp.asarray(q * skew)))
    tb = bake_tri_bin_cdf(scene, vols_skew, rl, t_pad, uv_bins=2,
                          sector_grid=11)
    cfg = RenderConfig(width=48, height=48, samples_per_pixel=16,
                       max_ray_bounces=6)
    img_g, _ = render_guided_mega(jax.random.PRNGKey(11), scene, cam, tb,
                                  cfg, r_tile=512, pix_mux=2, interpret=True)
    img_d, _ = render_default_mega(jax.random.PRNGKey(12), scene, cam, cfg,
                                   r_tile=512, pix_mux=2, interpret=True)
    assert np.isfinite(np.asarray(img_g)).all()
    _mean_close(img_g, img_d, 0.08)


def test_guided_reference_sector_grid(setup):
    """sector_grid=12 (the reference's 12x12) must work too — the 11
    default is an MXU-tile optimisation, not a semantic constraint."""
    scene, cam, rl, vols, t_pad = setup
    tb = bake_tri_bin_cdf(scene, vols, rl, t_pad, uv_bins=2, sector_grid=12)
    assert tb.cdf.shape[0] == 144
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=4,
                       max_ray_bounces=4)
    img, _ = render_guided_mega(jax.random.PRNGKey(0), scene, cam, tb, cfg,
                                r_tile=256, pix_mux=2, interpret=True)
    assert np.isfinite(np.asarray(img)).all()


def test_guided_multichunk_per_triangle(monkeypatch, setup):
    """Multi-chunk scenes run guided inference with PER-TRIANGLE tables
    (uv_bins=1): force cornell into 3 chunks and check the guided image
    still matches the default megakernel's mean (unbiasedness through the
    streaming intersect + row-11 triangle-id fetch)."""
    import rlrpt_tpu.ops.guided_mega as gm
    import rlrpt_tpu.ops.megakernel as mk

    scene, cam, rl, vols, _ = setup
    monkeypatch.setattr(mk, "T_CHUNK", 16)   # 38 tris -> t_pad 48, 3 chunks
    monkeypatch.setattr(gm, "T_CHUNK", 16)
    jax.clear_caches()
    t_pad = mk.mt_tables(scene)[0].shape[0] // 4
    assert t_pad // min(t_pad, 16) > 1
    tb = bake_tri_bin_cdf(scene, vols, rl, t_pad, uv_bins=1, sector_grid=11)
    cfg = RenderConfig(width=48, height=48, samples_per_pixel=8,
                       max_ray_bounces=6)
    img_g, _ = render_guided_mega(jax.random.PRNGKey(21), scene, cam, tb,
                                  cfg, r_tile=512, pix_mux=2, interpret=True)
    img_d, _ = render_default_mega(jax.random.PRNGKey(22), scene, cam, cfg,
                                   r_tile=512, pix_mux=2, interpret=True)
    jax.clear_caches()
    assert np.isfinite(np.asarray(img_g)).all()
    _mean_close(img_g, img_d, 0.08)

    # uv_bins > 1 must be rejected for multi-chunk scenes
    tb4 = bake_tri_bin_cdf(scene, vols, rl, t_pad, uv_bins=4, sector_grid=11)
    with pytest.raises(ValueError, match="uv_bins=1"):
        render_guided_mega(jax.random.PRNGKey(0), scene, cam, tb4, cfg,
                           r_tile=512, pix_mux=2, interpret=True)
