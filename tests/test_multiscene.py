"""Multi-scene sharded batch render tests (8-device virtual CPU mesh)."""

import jax
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.integrators.default_tracer import render_default
from rlrpt_tpu.parallel.multiscene import (pad_scene, render_multiscene_dp,
                                           stack_scenes)
from rlrpt_tpu.scene import cornell_box, presets

_CFG = RenderConfig(width=20, height=20, samples_per_pixel=2,
                    max_ray_bounces=3, ray_tile=512)


def test_pad_scene_preserves_render():
    scene = cornell_box()
    cam = Camera.create([0.0, 0.0, -3.0])
    padded = pad_scene(scene, scene.n_surfaces + 7, scene.n_lights + 3)
    img0, _ = render_default(jax.random.PRNGKey(0), scene, cam, _CFG)
    img1, _ = render_default(jax.random.PRNGKey(0), padded, cam, _CFG)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-4, atol=1e-5)


def test_multiscene_batch_renders():
    names = ["cornell", "box", "simple_room"]
    scenes, cams = [], []
    for n in names:
        p = presets.get(n)
        scenes.append(p.load())
        cams.append(Camera.create(p.camera_position))
    imgs = render_multiscene_dp(jax.random.PRNGKey(0), scenes, cams, _CFG)
    imgs = np.asarray(imgs)
    assert imgs.shape == (3, 20, 20, 3)
    assert np.isfinite(imgs).all()
    # cornell render agrees with the single-scene path statistically
    solo, _ = render_default(jax.random.PRNGKey(1), scenes[0], cams[0], _CFG)
    assert abs(imgs[0].mean() - float(np.asarray(solo).mean())) < 0.5 * max(
        float(np.asarray(solo).mean()), 1e-3)


def test_multiscene_deep_train_joint_grads():
    """BASELINE #5 training composition: two scenes sharded over the mesh
    train ONE shared net with per-minibatch grad psum.  Health checks:
    per-scene images finite, joint loss finite and positive, params
    actually move, and a frame advances epsilon by spp decays."""
    import jax.numpy as jnp
    from rlrpt_tpu.config import DeepLearningConfig, RadianceVolumeConfig
    from rlrpt_tpu.parallel.mesh import make_mesh
    from rlrpt_tpu.parallel.multiscene import (init_multiscene_neural_q,
                                               train_multiscene_deep_dp)

    names = ["cornell", "test_room"]
    scenes, cams = [], []
    for n in names:
        p = presets.get(n)
        scenes.append(p.load().to_device())
        cams.append(Camera.create(p.camera_position))
    rl = RadianceVolumeConfig(grid_resolution=6)
    dl = DeepLearningConfig(batch_size=256, hidden_sizes=(24, 32, 24))
    mesh = make_mesh(2)
    params, opt_state, batched = init_multiscene_neural_q(
        jax.random.PRNGKey(5), scenes, dl, rl.grid_resolution)
    p0 = jax.tree_util.tree_map(lambda x: x.copy(), params)
    imgs, params, opt_state, eps, aux = train_multiscene_deep_dp(
        jax.random.PRNGKey(6), scenes, cams, params, opt_state, 0.05,
        _CFG, rl, dl, mesh=mesh, interpret=True, batched=batched)
    imgs = np.asarray(imgs)
    assert imgs.shape == (2, 20, 20, 3)
    assert np.isfinite(imgs).all()
    assert np.isfinite(float(aux["loss"])) and float(aux["loss"]) > 0.0
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0, "params never moved"
    assert np.asarray(aux["zero_contribution_light_paths"]).shape == (2,)
    # floored at epsilon_min (reference schedule)
    assert abs(float(eps) - 0.05) < 1e-6
