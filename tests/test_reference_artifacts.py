"""Fixture tests against the REAL reference data artifacts on disk.

These pin the cross-implementation file contracts (SURVEY §2.6, §5.4) to
the actual files the reference ships in /root/reference/Radiance_Map_Data/
— not just to our own writer's output:

* DyNet text .model exchange (cornell_12_12.model; format at
  Radiance_Map_Data/cornell_12_12.model:1, reader/writer contract at
  pre_trained_pathtracer.cu:45-53 + neural_q_pathtracer.cu:191-196);
* probe-point files (to_select.txt, hemisphere_helpers.cu:230-281);
* selected-volume dumps (selected_sarsa.txt, radiance_map.cu:272-302);
* the renderer<->offline-trainer vertex contract (vertices.txt,
  scene.cu:63-88).
"""

import os

import numpy as np
import pytest

REF = "/root/reference/Radiance_Map_Data"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference data not mounted")


@needs_ref
def test_load_shipped_dynet_model():
    """The shipped cornell model loads with the exact reference shapes
    (342 = 9 floats x 38 cornell triangles -> 200 -> 300 -> 200 -> 144)."""
    from rlrpt_tpu.nn.dynet_io import load_dynet_model

    params = load_dynet_model(os.path.join(REF, "cornell_12_12.model"))
    shapes = [tuple(l.w.shape) for l in params.layers]
    assert shapes == [(200, 342), (300, 200), (200, 300), (144, 200)]
    for layer in params.layers:
        assert layer.b.shape == (layer.w.shape[0],)
        assert np.all(np.isfinite(np.asarray(layer.w)))


@needs_ref
def test_dynet_save_byte_roundtrip():
    """Re-saving the parsed shipped model reproduces it byte-for-byte —
    our writer emits exactly DyNet's TextFileSaver format ("%+.8e" + one
    space per value incl. trailing, header 4th field = data-line byte
    length incl. newline)."""
    from rlrpt_tpu.nn.dynet_io import load_dynet_model, save_dynet_model

    src = os.path.join(REF, "cornell_12_12.model")
    params = load_dynet_model(src)
    out = "/tmp/roundtrip_cornell.model"
    save_dynet_model(params, out)
    with open(src, "rb") as f:
        ref_bytes = f.read()
    with open(out, "rb") as f:
        our_bytes = f.read()
    assert our_bytes == ref_bytes


@needs_ref
def test_pretrained_render_from_shipped_model():
    """Mode-4 inference (pre_trained_pathtracer.cu) runs end-to-end from
    the reference's own checkpoint on our cornell scene."""
    import jax

    from rlrpt_tpu.camera import Camera
    from rlrpt_tpu.config import (DeepLearningConfig, RadianceVolumeConfig,
                                  RenderConfig)
    from rlrpt_tpu.deep.pretrained import render_frame_pretrained
    from rlrpt_tpu.nn.dynet_io import load_dynet_model
    from rlrpt_tpu.scene import cornell_box

    scene = cornell_box()
    assert int(scene.vertices_flat.shape[0]) == 342  # matches model input
    params = load_dynet_model(os.path.join(REF, "cornell_12_12.model"))
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=1,
                       max_ray_bounces=4)
    img, aux = render_frame_pretrained(
        jax.random.PRNGKey(3), scene, Camera.create([0.0, 0.0, -3.0]),
        params, cfg, RadianceVolumeConfig(), DeepLearningConfig())
    img = np.asarray(img)
    assert img.shape == (16, 16, 3)
    assert np.all(np.isfinite(img)) and np.all(img >= 0.0)
    assert float(img.max()) > 0.0  # something lit the frame
    assert float(aux["avg_path_length"]) > 0.0


@needs_ref
def test_read_shipped_probe_points():
    from rlrpt_tpu.radiance.map_io import read_probe_points

    locs, norms = read_probe_points(
        os.path.join(REF, "selected_radiance_volumes", "to_select.txt"))
    assert locs.shape[0] > 0 and locs.shape == norms.shape
    # normals are unit-ish axis vectors in the shipped file
    lens = np.linalg.norm(norms, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    # probe positions live inside the [-1,1]-normalised scene box
    assert np.all(np.abs(locs) <= 1.0 + 1e-5)


@needs_ref
def test_load_shipped_selected_sarsa():
    from rlrpt_tpu.radiance.map_io import load_volumes_from_selected

    vols = load_volumes_from_selected(
        os.path.join(REF, "selected_radiance_volumes", "selected_sarsa.txt"))
    v = vols.position.shape[0]
    assert v > 0
    assert vols.q.shape == (v, 144)
    q = np.asarray(vols.q)
    assert np.all(q >= 0.0)
    # rows are stored as normalised sampling distributions
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-3)
    cdf = np.asarray(vols.cdf)
    np.testing.assert_allclose(cdf[:, -1], 1.0, atol=1e-3)


@needs_ref
def test_load_shipped_vertices():
    from rlrpt_tpu.scene.scene import load_vertices_from_file

    flat = load_vertices_from_file(os.path.join(REF, "vertices.txt"))
    assert flat.size % 9 == 0  # 9 floats per triangle (scene.cu:63-88)
    tris = flat.reshape(-1, 9)
    assert tris.shape[0] == 102
    assert np.all(np.isfinite(tris))


@needs_ref
def test_read_shipped_training_stats():
    """The shipped stats files parse with our reader (format
    `avg_path_length loss zero_contribution_paths` per line, produced at
    neural_q_pathtracer.cu:577-583 / main.cu:335-339) and reproduce the
    BASELINE.md trajectories."""
    from rlrpt_tpu.utils.stats import read_stats

    rows = read_stats(os.path.join(REF, "sarsa_training_stats.txt"))
    assert len(rows) >= 3
    # BASELINE.md: avg path length 6 -> 3, ZCLP 229136 -> 21398 in 3 frames
    assert rows[0][0] == pytest.approx(6.0, abs=0.5)
    assert rows[0][2] == 229136
    assert rows[2][2] == 21398

    rows = read_stats(os.path.join(REF, "nn_training_stats.txt"))
    assert rows[0][0] == pytest.approx(29.4817, rel=1e-4)
    assert rows[0][1] == pytest.approx(1.3007e12, rel=1e-3)
    assert rows[0][2] == 270726
