"""CLI smoke tests for the round-4 harnesses (tiny CPU configs).

scene_bench measures large-scene megakernel throughput (SCENE_BENCH.json);
nn_training_stats records the reference's per-spp training-stats protocol
(neural_q_pathtracer.cu:577-583) — these run them end-to-end and check the
emitted artifacts, not performance.
"""

import json

from rlrpt_tpu.tools import nn_training_stats, scene_bench
from rlrpt_tpu.utils.stats import read_stats


def test_scene_bench_emits_rows(tmp_path, capsys):
    out = tmp_path / "sb.json"
    scene_bench.main(["--scenes", "cornell,cube", "--size", "24",
                      "--bounces", "4", "--frames", "1", "--r-tile", "256",
                      "--pix-mux", "2", "--json", str(out)])
    data = json.loads(out.read_text())
    assert [r["scene"] for r in data["rows"]] == ["cornell", "cube"]
    for r in data["rows"]:
        assert r["triangles"] > 0
        assert r["rays_per_sec"] > 0
        assert r["ray_tri_tests_per_sec"] >= r["rays_per_sec"]


def test_nn_training_stats_protocol_lines(tmp_path, capsys):
    stats = tmp_path / "stats.txt"
    summary = tmp_path / "summary.json"
    nn_training_stats.main(["--frames", "2", "--spp", "2", "--size", "24",
                            "--bounces", "4", "--pix-mux", "2",
                            "--out", str(stats), "--json", str(summary)])
    rows = read_stats(str(stats))
    assert len(rows) == 4                      # frames * spp per-spp lines
    for plen, loss, zclp in rows:
        assert plen > 0 and loss >= 0 and zclp >= 0
    s = json.loads(summary.read_text())
    assert s["frames"] == 2 and s["spp"] == 2
    assert s["first"] == list(rows[0]) or tuple(s["first"]) == rows[0]
