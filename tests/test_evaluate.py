"""Smoke test for the thesis MAPE evaluation harness (tools/evaluate.py,
protocol: 4_critical_evaluation.tex:47-69).  Tiny sizes; the recorded
run (EVAL.json) happens on the chip at the real protocol settings."""

import jax
import numpy as np

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.scene import cornell_box
from rlrpt_tpu.tools.evaluate import evaluate_scene


def test_evaluate_scene_smoke():
    rows = evaluate_scene(
        cornell_box(), Camera.create([0.0, 0.0, -3.0]),
        size=32, gt_spp=16, spp=8, bounces=6, sarsa_frames=1, sarsa_spp=2,
        nq_frames=1, nq_spp=1, area_per_sample=0.05, interpret=True,
        key=jax.random.PRNGKey(0))
    methods = [r["method"] for r in rows]
    assert methods == ["default", "sarsa", "neural_q"]
    for r in rows:
        assert np.isfinite(r["mape"]) and r["mape"] >= 0.0
        assert r["spp"] == 8 and r["gt_spp"] == 16
