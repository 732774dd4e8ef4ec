"""Checkpoint/resume: full mid-training state roundtrips exactly."""

import jax
import numpy as np

from rlrpt_tpu.config import DeepLearningConfig, RadianceVolumeConfig
from rlrpt_tpu.deep.neural_q import init_neural_q
from rlrpt_tpu.radiance.volumes import build_radiance_volumes
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.utils.checkpoint import (load_training_state,
                                        save_training_state)

_DL = DeepLearningConfig(hidden_sizes=(16, 16))
_RL = RadianceVolumeConfig(area_per_sample=0.05, grid_resolution=6)


def test_full_state_roundtrip(tmp_path):
    scene = cornell_box()
    params, opt_state = init_neural_q(jax.random.PRNGKey(0), scene, _DL,
                                      _RL.grid_resolution)
    vols = build_radiance_volumes(scene, _RL)
    p = str(tmp_path / "ckpt.npz")
    save_training_state(p, params, opt_state, epsilon=0.37, frame=12,
                        vols=vols)
    params2, opt2, eps, frame, vols2 = load_training_state(p, params,
                                                           opt_state)
    assert eps == np.float32(0.37) and frame == 12
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(opt2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(vols.q), np.asarray(vols2.q))
    np.testing.assert_array_equal(np.asarray(vols.visits),
                                  np.asarray(vols2.visits))
    assert vols2.grid_resolution == vols.grid_resolution


def test_params_only_roundtrip(tmp_path):
    scene = cornell_box()
    params, opt_state = init_neural_q(jax.random.PRNGKey(1), scene, _DL,
                                      _RL.grid_resolution)
    p = str(tmp_path / "ckpt2.npz")
    save_training_state(p, params, opt_state, epsilon=0.05, frame=0)
    _, _, _, _, vols = load_training_state(p, params, opt_state)
    assert vols is None
