"""Regenerative SARSA wavefront vs the lockstep reinforcement tracer.

Both implement the same learning rule and estimator; update batch
boundaries differ (module docstring), so equivalence is statistical:
images agree within Monte-Carlo noise, and learning health (zclp falling,
paths shortening across frames) matches the lockstep tracer's behaviour
(ref stats trajectory: Radiance_Map_Data/sarsa_training_stats.txt).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.integrators.reinforcement_tracer import render_frame_sarsa
from rlrpt_tpu.integrators.sarsa_wavefront import render_frame_sarsa_wavefront
from rlrpt_tpu.radiance.grid_bucket import build_volume_grid
from rlrpt_tpu.radiance.volumes import build_radiance_volumes
from rlrpt_tpu.scene import cornell_box

_CFG = RenderConfig(width=24, height=24, samples_per_pixel=8,
                    max_ray_bounces=12, ray_tile=1024)
_RL = RadianceVolumeConfig(area_per_sample=0.05, max_volumes=256)
_CAM = Camera.create([0.0, 0.0, -3.0])


def _setup():
    scene = cornell_box()
    vols = build_radiance_volumes(scene, _RL)
    grid = build_volume_grid(vols)
    return scene, vols, grid


def test_matches_lockstep_within_noise():
    scene, vols, grid = _setup()
    img_fast, vols_f, aux_f = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(3), scene, _CAM, vols, grid, _CFG, _RL,
        interpret=True)
    img_lock, vols_l, aux_l = render_frame_sarsa(
        jax.random.PRNGKey(3), scene, _CAM, vols, _CFG, _RL)
    img_lock2, _, _ = render_frame_sarsa(
        jax.random.PRNGKey(4), scene, _CAM, vols, _CFG, _RL)
    noise = float(jnp.mean(jnp.abs(img_lock - img_lock2)))
    err = float(jnp.mean(jnp.abs(img_fast - img_lock)))
    assert err < 3.0 * noise + 1e-3, (err, noise)
    # Comparable learning signal (both see the same sample budget).
    assert float(aux_f["avg_path_length"]) > 0
    assert abs(float(aux_f["avg_path_length"])
               - float(aux_l["avg_path_length"])) < 3.0


def test_learning_health_improves_over_frames():
    scene, vols, grid = _setup()
    zclps, plens = [], []
    for f in range(3):
        img, vols, aux = render_frame_sarsa_wavefront(
            jax.random.PRNGKey(10 + f), scene, _CAM, vols, grid, _CFG, _RL,
            interpret=True)
        zclps.append(int(aux["zero_contribution_light_paths"]))
        plens.append(float(aux["avg_path_length"]))
    assert zclps[-1] <= zclps[0]
    assert plens[-1] <= plens[0] + 0.5
    assert bool(jnp.all(jnp.isfinite(img)))


def test_pix_mux_same_estimator():
    scene, vols, grid = _setup()
    img1, _, aux1 = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(5), scene, _CAM, vols, grid, _CFG, _RL,
        pix_mux=1, interpret=True)
    img4, _, aux4 = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(5), scene, _CAM, vols, grid, _CFG, _RL,
        pix_mux=4, interpret=True)
    img1b, _, _ = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(6), scene, _CAM, vols, grid, _CFG, _RL,
        pix_mux=1, interpret=True)
    noise = float(jnp.mean(jnp.abs(img1 - img1b)))
    assert float(jnp.mean(jnp.abs(img4 - img1))) < 3.0 * noise + 1e-3


def test_drain_cascade_matches_single_phase(monkeypatch):
    """Shrinking the wavefront mid-frame must not change the result: the
    cascade only re-slices state that dead slots no longer contribute to."""
    import rlrpt_tpu.integrators.sarsa_wavefront as sw
    scene, vols, grid = _setup()
    img_one, vols1, aux_one = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(9), scene, _CAM, vols, grid, _CFG, _RL,
        interpret=True)
    monkeypatch.setattr(sw, "_MIN_DRAIN_W", 16)
    jax.clear_caches()   # pix_mux/cfg unchanged -> force re-trace
    img_casc, vols2, aux_casc = sw.render_frame_sarsa_wavefront(
        jax.random.PRNGKey(9), scene, _CAM, vols, grid, _CFG, _RL,
        interpret=True)
    # Per-iteration uniforms are shaped by the phase width, so the cascade
    # is a different (equally valid) RNG schedule: compare statistically.
    img_b, _, _ = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(11), scene, _CAM, vols, grid, _CFG, _RL,
        interpret=True)
    noise = float(jnp.mean(jnp.abs(img_one - img_b)))
    assert float(jnp.mean(jnp.abs(img_casc - img_one))) < 3.0 * noise + 1e-3
    # Every sample still completes exactly once.
    assert int(jnp.sum(vols2.visits)) > 0
    assert abs(float(aux_casc["avg_path_length"])
               - float(aux_one["avg_path_length"])) < 3.0


def test_q_visits_conserved():
    """Every pending TD contribution lands EXACTLY once: the visit-count
    delta equals the number of TD scatters issued (counted from the
    pre-scatter pending mask, aux["td_scatter_count"]), exact across
    pix_mux / drain schedules — a dropped or double-counted segment_sum
    scatter breaks the equality."""
    scene, vols, grid = _setup()
    v0 = int(jnp.sum(vols.visits))
    for pix_mux in (1, 2):
        _, vols_out, aux = render_frame_sarsa_wavefront(
            jax.random.PRNGKey(7), scene, _CAM, vols, grid, _CFG, _RL,
            pix_mux=pix_mux, interpret=True)
        delta = int(jnp.sum(vols_out.visits)) - v0
        td = int(aux["td_scatter_count"])
        assert td > 0
        assert delta == td, (delta, td, pix_mux)


def test_bsearch_sampler_matches_gather_sampler():
    """sample_from_cdf_bsearch draws the same uniforms (same split/stream)
    and must return the identical sector/pdf/direction as sample_from_cdf.
    (Kept as an alternative sampler; measured slower on v5e, see
    integrators/sarsa_wavefront.py docstring.)"""
    from rlrpt_tpu.radiance.volumes import (sample_from_cdf,
                                            sample_from_cdf_bsearch)
    scene, vols, grid = _setup()
    key = jax.random.PRNGKey(2)
    idx = jax.random.randint(key, (257,), 0, vols.n_volumes)
    d1, s1, p1 = sample_from_cdf(key, vols, idx, _RL.grid_rho)
    d2, s2, p2 = sample_from_cdf_bsearch(key, vols, idx, _RL.grid_rho)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5,
                               atol=1e-6)


def test_hier_sampler_matches_row_sampler_distribution():
    """Two-level inverse-CDF sampling draws from exactly the same sector
    pmf as the flat row sampler (product decomposition); compare sector
    histograms over many draws from a few non-uniform volumes."""
    import dataclasses

    from rlrpt_tpu.radiance.volumes import (build_radiance_volumes,
                                            hier_cdf_tables, rebuild_cdf,
                                            sample_from_cdf,
                                            sample_from_cdf_hier)
    from rlrpt_tpu.scene import cornell_box

    scene = cornell_box()
    rl = RadianceVolumeConfig(area_per_sample=0.05)
    vols = build_radiance_volumes(scene, rl)
    # skewed, volume-dependent Q -> non-trivial CDFs
    key = jax.random.PRNGKey(11)
    q = jax.random.uniform(key, vols.q.shape) ** 4 + 1e-4
    vols = dataclasses.replace(vols, q=q)
    vols = rebuild_cdf(vols)

    n = 60000
    vol_idx = jnp.zeros((n,), jnp.int32) + 3
    k = jax.random.PRNGKey(5)
    _, sec_row, pdf_row = sample_from_cdf(k, vols, vol_idx, rl.grid_rho)
    cdf_c, cdf_f = hier_cdf_tables(vols.cdf, rl.grid_resolution)
    fr = vols.frame[vol_idx]
    _, sec_h, pdf_h = sample_from_cdf_hier(k, cdf_c, cdf_f, fr, vol_idx,
                                           rl.grid_rho, rl.grid_resolution)
    s = vols.n_sectors
    h_row = np.bincount(np.asarray(sec_row), minlength=s) / n
    h_h = np.bincount(np.asarray(sec_h), minlength=s) / n
    # total-variation distance between the empirical pmfs ~ sampling noise
    tv = 0.5 * np.abs(h_row - h_h).sum()
    assert tv < 0.02, tv
    # pdf values must be the pmf of the SAME distribution: group by sector
    for sec, pdfs in ((sec_row, pdf_row), (sec_h, pdf_h)):
        sec = np.asarray(sec)
        pdfs = np.asarray(pdfs)
        for smp in np.unique(sec)[:10]:
            vals = pdfs[sec == smp]
            np.testing.assert_allclose(vals, vals[0], rtol=2e-4)
    # cross-check: pdf per sector identical between samplers
    m_row = {int(a): float(b) for a, b in zip(np.asarray(sec_row),
                                              np.asarray(pdf_row))}
    m_h = {int(a): float(b) for a, b in zip(np.asarray(sec_h),
                                            np.asarray(pdf_h))}
    common = sorted(set(m_row) & set(m_h))[:20]
    for smp in common:
        np.testing.assert_allclose(m_row[smp], m_h[smp], rtol=2e-4)


def test_bf16_cdf_rows_match_statistically():
    """bf16 CDF rows sample from a quantised-but-consistent distribution
    (pdf == true sampling probability, computed exactly in f32 after the
    gather), so images agree with f32 rows within MC noise."""
    scene, vols, grid = _setup()
    img32, v32, _ = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(8), scene, _CAM, vols, grid, _CFG, _RL,
        interpret=True)
    img16, v16, _ = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(8), scene, _CAM, vols, grid, _CFG, _RL,
        interpret=True, cdf_dtype="bf16")
    img32b, _, _ = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(9), scene, _CAM, vols, grid, _CFG, _RL,
        interpret=True)
    noise = float(jnp.mean(jnp.abs(img32 - img32b)))
    err = float(jnp.mean(jnp.abs(img16 - img32)))
    assert err < 3.0 * noise + 1e-3, (err, noise)
    # Learning continues sanely under the quantised bootstrap.
    assert bool(jnp.all(jnp.isfinite(v16.q)))
