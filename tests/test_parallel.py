"""Sharded-path tests on the 8-device virtual CPU mesh.

Checks both that the data-parallel paths compile+run over a real Mesh and
that they agree with the single-device implementations (exactly where the
math is identical, statistically where RNG streams differ).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import (DeepLearningConfig, RadianceVolumeConfig,
                              RenderConfig)
from rlrpt_tpu.deep.neural_q import init_neural_q
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.parallel import (make_mesh, neural_q_train_step_dp,
                                render_default_dp, render_frame_sarsa_dp)
from rlrpt_tpu.radiance.volumes import build_radiance_volumes
from rlrpt_tpu.scene import cornell_box

_CFG = RenderConfig(width=24, height=24, samples_per_pixel=2,
                    max_ray_bounces=4, ray_tile=1024)
_RL = RadianceVolumeConfig(area_per_sample=0.05, grid_resolution=6)
_DL = DeepLearningConfig(batch_size=512, hidden_sizes=(16, 16))


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_default_dp_matches_statistics():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    cfg = RenderConfig(width=24, height=24, samples_per_pixel=16,
                       max_ray_bounces=4, ray_tile=1024)
    img_dp, aux = render_default_dp(jax.random.PRNGKey(0), scene, cam, cfg)
    img_1, _ = render_default(jax.random.PRNGKey(0), scene, cam, cfg)
    img_dp, img_1 = np.asarray(img_dp), np.asarray(img_1)
    assert img_dp.shape == img_1.shape == (24, 24, 3)
    assert np.isfinite(img_dp).all()
    # Different RNG streams -> only statistical agreement of the mean level
    # (a 24x24 frame at 16 spp still carries real MC noise).
    assert abs(img_dp.mean() - img_1.mean()) < 0.35 * max(img_1.mean(), 1e-3)
    assert float(aux["avg_path_length"]) > 0.0


def test_sarsa_dp_learns_and_q_replicated():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    vols = build_radiance_volumes(scene, _RL)
    img, vols2, aux = render_frame_sarsa_dp(
        jax.random.PRNGKey(0), scene, cam, vols, _CFG, _RL)
    assert np.isfinite(np.asarray(img)).all()
    # learning happened
    assert int(np.asarray(vols2.visits).sum()) > 0
    assert not np.allclose(np.asarray(vols2.q), np.asarray(vols.q))
    # the replicated Q-table must be globally addressable & identical
    q = jax.device_get(vols2.q)
    assert np.isfinite(q).all()


def test_neural_q_train_step_dp_runs():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    params, opt_state = init_neural_q(jax.random.PRNGKey(0), scene, _DL,
                                      _RL.grid_resolution)
    tp, params2, opt2, loss = neural_q_train_step_dp(
        jax.random.PRNGKey(1), scene, cam, params, opt_state, 0.3,
        _CFG, _RL, _DL)
    assert np.asarray(tp).shape == (_CFG.n_pixels, 3)
    assert np.isfinite(np.asarray(tp)).all()
    assert float(loss) > 0.0
    assert not np.allclose(np.asarray(params.layers[0].w),
                           np.asarray(params2.layers[0].w))


def test_sarsa_wavefront_dp_matches_single_device():
    from rlrpt_tpu.integrators.sarsa_wavefront import \
        render_frame_sarsa_wavefront
    from rlrpt_tpu.parallel.dp import render_frame_sarsa_wavefront_dp
    from rlrpt_tpu.radiance.grid_bucket import build_volume_grid

    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    cfg = RenderConfig(width=24, height=24, samples_per_pixel=8,
                       max_ray_bounces=8, ray_tile=1024)
    vols = build_radiance_volumes(scene, _RL)
    grid = build_volume_grid(vols)
    img_dp, vols_dp, aux_dp = render_frame_sarsa_wavefront_dp(
        jax.random.PRNGKey(0), scene, cam, vols, grid, cfg, _RL,
        interpret=True)
    img_1, vols_1, aux_1 = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(0), scene, cam, vols, grid, cfg, _RL,
        interpret=True)
    img_1b, _, _ = render_frame_sarsa_wavefront(
        jax.random.PRNGKey(1), scene, cam, vols, grid, cfg, _RL,
        interpret=True)
    img_dp, img_1 = np.asarray(img_dp), np.asarray(img_1)
    assert img_dp.shape == (24, 24, 3) and np.isfinite(img_dp).all()
    noise = float(np.mean(np.abs(img_1 - np.asarray(img_1b))))
    assert float(np.mean(np.abs(img_dp - img_1))) < 3.0 * noise + 1e-3
    # learning happened and the replicated Q-table is identical per device
    assert int(np.asarray(vols_dp.visits).sum()) > 0
    q = jax.device_get(vols_dp.q)
    assert np.isfinite(q).all()


def test_deep_wavefront_dp_pretrained_and_train():
    from rlrpt_tpu.parallel.dp import (
        render_frame_neural_q_wavefront_dp,
        render_frame_pretrained_wavefront_dp)
    from rlrpt_tpu.deep.deep_wavefront import (
        render_frame_pretrained_wavefront)

    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    cfg = RenderConfig(width=24, height=24, samples_per_pixel=4,
                       max_ray_bounces=8, ray_tile=1024)
    dl = DeepLearningConfig(batch_size=256, hidden_sizes=(32, 48, 32))
    params, opt_state = init_neural_q(jax.random.PRNGKey(7), scene, dl,
                                      _RL.grid_resolution)

    img_dp, aux_dp = render_frame_pretrained_wavefront_dp(
        jax.random.PRNGKey(3), scene, cam, params, cfg, _RL, dl,
        interpret=True)
    img_1, _ = render_frame_pretrained_wavefront(
        jax.random.PRNGKey(3), scene, cam, params, cfg, _RL, dl,
        interpret=True)
    img_1b, _ = render_frame_pretrained_wavefront(
        jax.random.PRNGKey(4), scene, cam, params, cfg, _RL, dl,
        interpret=True)
    noise = float(np.mean(np.abs(np.asarray(img_1) - np.asarray(img_1b))))
    err = float(np.mean(np.abs(np.asarray(img_dp) - np.asarray(img_1))))
    assert err < 3.0 * noise + 1e-3, (err, noise)

    img_t, params2, opt2, eps2, aux_t = render_frame_neural_q_wavefront_dp(
        jax.random.PRNGKey(5), scene, cam, params, opt_state, 1.0, cfg,
        _RL, dl, interpret=True)
    assert np.isfinite(np.asarray(img_t)).all()
    assert np.isfinite(float(aux_t["loss"]))
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0.0
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)))
    assert moved
    for leaf in jax.tree_util.tree_leaves(params2):
        assert bool(jnp.all(jnp.isfinite(leaf)))
