"""In-kernel binned-SARSA learning megakernel tests.

Three load-bearing properties:
* the exact TD-visit invariant (td_scatter_count == the visit-count
  delta — the same invariant the XLA wavefront asserts, radiance_volume
  .cu:283-301 semantics on the binned state space);
* unbiasedness of the rendered frame while learning (any pdf/update slip
  shifts the mean);
* learning health across frames (zclp-style: the learned distribution
  concentrates toward radiance, q moves, renders stay unbiased).
"""

import jax
import numpy as np
import pytest

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RadianceVolumeConfig, RenderConfig
from rlrpt_tpu.ops.guided_mega_train import (bin_luminance, init_bin_q,
                                             rebuild_bin_cdf,
                                             render_sarsa_mega_train)
from rlrpt_tpu.ops.megakernel import mt_tables, render_default_mega
from rlrpt_tpu.scene import cornell_box

_G_DIR = 11
_UV = 2


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box().to_device()
    cam = Camera.create([0.0, 0.0, -3.0])
    rl = RadianceVolumeConfig(grid_resolution=_G_DIR)
    t_pad = mt_tables(scene)[0].shape[0] // 4
    return scene, cam, rl, t_pad


def _train_frames(setup, n_frames, cfg, key=0):
    scene, cam, rl, t_pad = setup
    q, vis = init_bin_q(t_pad, _UV, _G_DIR, rl.initial_radiance)
    outs = []
    for f in range(n_frames):
        tb = rebuild_bin_cdf(q, _G_DIR, _UV, t_pad)
        img, q, vis, aux = render_sarsa_mega_train(
            jax.random.PRNGKey(key + f), scene, cam, tb, q, vis, cfg,
            rl.radiance_threshold, r_tile=512, pix_mux=2, interpret=True)
        outs.append((img, aux))
    return q, vis, outs


def test_visit_invariant_exact(setup):
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=4,
                       max_ray_bounces=6)
    q, vis, outs = _train_frames(setup, 2, cfg)
    total_td = sum(int(a["td_scatter_count"]) for _, a in outs)
    assert total_td > 0
    assert float(np.asarray(vis).sum()) == float(total_td)


def test_learning_frame_unbiased(setup):
    scene, cam, rl, t_pad = setup
    cfg = RenderConfig(width=48, height=48, samples_per_pixel=8,
                       max_ray_bounces=6)
    # Frame 2 samples from a LEARNED (non-uniform) distribution — the mean
    # must still match the default tracer.
    q, vis, outs = _train_frames(setup, 2, cfg, key=11)
    img2 = np.asarray(outs[-1][0])
    img_d, _ = render_default_mega(jax.random.PRNGKey(99), scene, cam, cfg,
                                   r_tile=512, pix_mux=2, interpret=True)
    assert np.isfinite(img2).all()
    md = float(np.mean(np.asarray(img_d)))
    assert abs(float(np.mean(img2)) - md) / max(md, 1e-9) < 0.08


def test_q_learns_toward_radiance(setup):
    scene, cam, rl, t_pad = setup
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=8,
                       max_ray_bounces=8)
    q, vis, outs = _train_frames(setup, 3, cfg, key=5)
    qn = np.asarray(q)[:_G_DIR * _G_DIR]
    assert np.isfinite(qn).all()
    assert (qn >= rl.radiance_threshold - 1e-6).all()
    # Learning moved the table away from its uniform init and visited a
    # substantial share of bins.
    assert float(np.std(qn)) > 0.01
    visited = (np.asarray(vis)[:_G_DIR * _G_DIR] > 0).mean()
    assert visited > 0.05


def test_bin_luminance_layout(setup):
    scene, cam, rl, t_pad = setup
    lum = np.asarray(bin_luminance(scene, t_pad, _UV))
    assert lum.shape == (1, t_pad * _UV * _UV)
    # Every bin of triangle 0 carries triangle 0's luminance.
    t0 = float(np.asarray(scene.luminance)[0])
    assert np.allclose(lum[0, :_UV * _UV], t0)


def test_rebuild_bin_cdf_monotone(setup):
    scene, cam, rl, t_pad = setup
    q, _ = init_bin_q(t_pad, _UV, _G_DIR, rl.initial_radiance)
    tb = rebuild_bin_cdf(q, _G_DIR, _UV, t_pad, defensive_mix=0.1)
    cdf = np.asarray(tb.cdf, np.float32)
    s = _G_DIR * _G_DIR
    assert (np.diff(cdf[:s], axis=0) >= -1e-6).all()
    np.testing.assert_allclose(cdf[s - 1], 1.0, atol=4e-3)
    assert (cdf[s:] == 2.0).all()


def test_sharded_guided_inference_and_merged_training(setup):
    """Multi-chip stories for the new kernels (4-device virtual mesh):
    seed-parallel guided inference matches the single-chip estimator in
    mean; the merged parallel learning frame preserves EXACT visit
    accounting (psum'd td_scatter_count == merged visit delta) and keeps
    q finite/thresholded."""
    import jax.numpy as jnp
    from rlrpt_tpu.parallel.dp import (render_guided_mega_dp,
                                       sarsa_mega_train_dp)
    from rlrpt_tpu.parallel.mesh import make_mesh
    from rlrpt_tpu.radiance.bake import bake_tri_bin_cdf
    from rlrpt_tpu.radiance.volumes import (build_radiance_volumes,
                                            rebuild_cdf)

    scene, cam, rl, t_pad = setup
    mesh = make_mesh(4)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=8,
                       max_ray_bounces=6)
    rl_fine = RadianceVolumeConfig(area_per_sample=0.01)
    vols = rebuild_cdf(build_radiance_volumes(scene, rl_fine))
    tb = bake_tri_bin_cdf(scene, vols, rl_fine, t_pad, uv_bins=2,
                          sector_grid=_G_DIR)
    img_dp, aux = render_guided_mega_dp(
        jax.random.PRNGKey(3), scene, cam, tb, cfg, mesh=mesh,
        r_tile=256, pix_mux=2, interpret=True)
    from rlrpt_tpu.ops.megakernel import render_default_mega
    img_ref, _ = render_default_mega(jax.random.PRNGKey(4), scene, cam, cfg,
                                     r_tile=256, pix_mux=2, interpret=True)
    assert np.isfinite(np.asarray(img_dp)).all()
    md = float(np.mean(np.asarray(img_ref)))
    assert abs(float(np.mean(np.asarray(img_dp))) - md) / md < 0.12

    q0, v0 = init_bin_q(t_pad, _UV, _G_DIR, rl.initial_radiance)
    tb0 = rebuild_bin_cdf(q0, _G_DIR, _UV, t_pad)
    img, q1, v1, aux = sarsa_mega_train_dp(
        jax.random.PRNGKey(5), scene, cam, tb0, q0, v0, cfg,
        rl.radiance_threshold, mesh=mesh, r_tile=256, pix_mux=2,
        interpret=True)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(q1)).all()
    assert int(aux["td_scatter_count"]) > 0
    assert float(np.asarray(v1 - np.asarray(v0)).sum()) == float(
        int(aux["td_scatter_count"]))
    s = _G_DIR * _G_DIR
    assert (np.asarray(q1)[:s] >= rl.radiance_threshold - 1e-6).all()
