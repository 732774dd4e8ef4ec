"""Deep-Q stack tests: factored encoding identity, online trainer smoke,
pretrained inference, offline distillation, probe/checkpoint IO."""

import jax
import jax.numpy as jnp
import numpy as np

from rlrpt_tpu.config import (DeepLearningConfig, RadianceVolumeConfig,
                              RenderConfig, TrainerConfig)
from rlrpt_tpu.camera import Camera
from rlrpt_tpu.deep.distill import distill, train_epoch, eval_mse
from rlrpt_tpu.deep.neural_q import (init_neural_q, render_frame_neural_q,
                                     respawn_terminated, init_rays)
from rlrpt_tpu.deep.pretrained import render_frame_pretrained
from rlrpt_tpu.deep.q_probe import probe_q_values, save_selected_q_values_nn
from rlrpt_tpu.nn.dq_network import (dq_apply, dq_apply_relative, dq_init)
from rlrpt_tpu.nn.dynet_io import load_dynet_model, save_dynet_model
from rlrpt_tpu.nn.encoding import relative_vertex_encoding
from rlrpt_tpu.scene import cornell_box

_CFG = RenderConfig(width=24, height=24, samples_per_pixel=1,
                    max_ray_bounces=4, ray_tile=1024)
_RL = RadianceVolumeConfig(grid_resolution=6)
_DL = DeepLearningConfig(batch_size=256, hidden_sizes=(32, 48, 32))


def test_factored_encoding_matches_materialised():
    key = jax.random.PRNGKey(0)
    scene = cornell_box()
    verts = scene.vertices_flat
    params = dq_init(key, verts.shape[0], 36, (32, 48, 32))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (7, 3), minval=-1.0,
                             maxval=1.0)
    enc = relative_vertex_encoding(verts, pos)            # (7, 3T)
    q_mat = dq_apply(params, enc)
    q_fac = dq_apply_relative(params, verts, pos)
    np.testing.assert_allclose(np.asarray(q_mat), np.asarray(q_fac),
                               rtol=2e-4, atol=2e-4)


def test_factored_encoding_gradients_match():
    key = jax.random.PRNGKey(2)
    scene = cornell_box()
    verts = scene.vertices_flat
    params = dq_init(key, verts.shape[0], 36, (16,))
    pos = jax.random.uniform(jax.random.PRNGKey(3), (5, 3), minval=-1.0,
                             maxval=1.0)
    tgt = jax.random.uniform(jax.random.PRNGKey(4), (5, 36))

    def loss_mat(p):
        return jnp.sum((dq_apply(p, relative_vertex_encoding(verts, pos))
                        - tgt) ** 2)

    def loss_fac(p):
        return jnp.sum((dq_apply_relative(p, verts, pos) - tgt) ** 2)

    g1 = jax.grad(loss_mat)(params)
    g2 = jax.grad(loss_fac)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_neural_q_frame_trains():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    params, opt_state = init_neural_q(jax.random.PRNGKey(0), scene, _DL,
                                      _RL.grid_resolution)
    img, params2, opt_state2, eps, aux = render_frame_neural_q(
        jax.random.PRNGKey(1), scene, cam, params, opt_state, 0.5,
        _CFG, _RL, _DL)
    img = np.asarray(img)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    # training happened: loss accumulated and params moved
    assert float(aux["loss"][0]) > 0.0
    w0 = np.asarray(params.layers[0].w)
    w1 = np.asarray(params2.layers[0].w)
    assert not np.allclose(w0, w1)
    # epsilon decayed by one step (start 0.5)
    assert abs(float(eps) - max(0.5 - _DL.epsilon_decay, _DL.epsilon_min)) < 1e-6


def test_pretrained_inference_renders():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    params, _ = init_neural_q(jax.random.PRNGKey(0), scene, _DL,
                              _RL.grid_resolution)
    img, aux = render_frame_pretrained(jax.random.PRNGKey(1), scene, cam,
                                       params, _CFG, _RL, _DL)
    img = np.asarray(img)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    assert float(aux["avg_path_length"]) > 0.0


def test_respawn_only_moves_terminated():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    s = init_rays(jax.random.PRNGKey(0), cam, _CFG)
    states = s.states.at[0].set(1).at[1].set(2)
    s = s._replace(states=states)
    out = respawn_terminated(jax.random.PRNGKey(1), s, scene)
    assert int(out.states[0]) == 2          # terminated -> learning-only
    assert int(out.states[1]) == 2          # untouched learning-only
    assert int(out.states[2]) == 0          # active untouched
    np.testing.assert_allclose(np.asarray(out.loc[2]), np.asarray(s.loc[2]))
    assert not np.allclose(np.asarray(out.loc[0]), np.asarray(s.loc[0]))


def test_distillation_reduces_error(tmp_path):
    # Synthetic q-table over random positions; targets from a fixed teacher
    # network so the data is learnable.
    rng = np.random.default_rng(0)
    scene = cornell_box()
    verts = np.asarray(scene.vertices_flat)
    pos = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)
    teacher = dq_init(jax.random.PRNGKey(9), len(verts), 16, (8,))
    q = np.asarray(dq_apply_relative(teacher, jnp.asarray(verts),
                                     jnp.asarray(pos)))
    qt = tmp_path / "radiance_map_data.txt"
    with open(qt, "w") as f:
        f.write("16\n")
        for i in range(len(pos)):
            f.write(" ".join(str(v) for v in list(pos[i]) + list(q[i])) + "\n")
    vt = tmp_path / "vertices.txt"
    with open(vt, "w") as f:
        for i in range(0, len(verts), 9):
            f.write(" ".join(str(v) for v in verts[i:i + 9]) + "\n")

    params, history = distill(str(qt), str(vt),
                              TrainerConfig(epochs=8, batch_size=64),
                              hidden_sizes=(16,))
    errs = [h[2] for h in history]
    assert errs[-1] < errs[0]


def test_dynet_roundtrip_and_probe(tmp_path):
    scene = cornell_box()
    params, _ = init_neural_q(jax.random.PRNGKey(0), scene, _DL,
                              _RL.grid_resolution)
    p = str(tmp_path / "model.model")
    save_dynet_model(params, p)
    params2 = load_dynet_model(p)
    pos = np.asarray([[0.0, 0.0, 0.0], [0.5, -0.5, 0.2]], np.float32)
    q1 = probe_q_values(params, scene, pos)
    q2 = probe_q_values(params2, scene, pos)
    np.testing.assert_allclose(q1, q2, rtol=1e-5, atol=1e-6)
    # each row is normalised
    np.testing.assert_allclose(q1.sum(-1), 1.0, atol=1e-5)

    probe = tmp_path / "to_select.txt"
    with open(probe, "w") as f:
        f.write("0 0 0 0 1 0\n0.5 -0.5 0.2 0 1 0\n")
    out = tmp_path / "selected_deep.txt"
    save_selected_q_values_nn(params, scene, str(probe), str(out))
    rows = np.loadtxt(out)
    assert rows.shape == (2, 6 + _RL.grid_resolution ** 2)
