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
    assert methods == ["default", "sarsa", "sarsa_guided", "default_eqtime",
                       "sarsa_mega", "default_eqtotal", "neural_q"]
    for r in rows:
        assert np.isfinite(r["mape"]) and r["mape"] >= 0.0
        assert r["gt_spp"] == 16
        if r["method"] not in ("default_eqtime", "default_eqtotal"):
            assert r["spp"] == 8
    guided = next(r for r in rows if r["method"] == "sarsa_guided")
    assert guided["uv_bins"] == 4 and guided["sector_grid"] == 11


def test_append_preserves_extra_top_level_keys(tmp_path, monkeypatch):
    import json
    from rlrpt_tpu.tools import evaluate
    out = tmp_path / "EVAL.json"
    out.write_text(json.dumps({
        "protocol": "x", "backend": "cpu", "notes": {"k": "kept"},
        "rows": [{"scene": "cornell", "method": "default", "mape": 1.0},
                 {"scene": "other", "method": "sarsa", "mape": 2.0}]}))
    evaluate.main(["--scene", "cornell", "--size", "16", "--gt-spp", "4",
                   "--spp", "2", "--bounces", "3", "--skip-sarsa",
                   "--skip-nq", "--append", "--out", str(out)])
    d = json.loads(out.read_text())
    assert d["notes"] == {"k": "kept"}
    scenes = {(r["scene"], r["method"]) for r in d["rows"]}
    assert ("other", "sarsa") in scenes          # untouched row kept
    # cornell/default replaced by the fresh run (not duplicated)
    assert sum(1 for r in d["rows"]
               if (r["scene"], r["method"]) == ("cornell", "default")) == 1
