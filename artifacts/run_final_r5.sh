#!/bin/bash
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
echo "=== EVAL complex_light_room (VMEM fix, cached GT) ==="
timeout 4800 python -m rlrpt_tpu.tools.evaluate --scene complex_light_room --sarsa-frames 10 \
  --nq-frames 24 --append --out EVAL.json --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -3
echo "=== EVAL door_room rerun (f32 hits: 0.001 near-coplanar light panel) ==="
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene door_room --russian-roulette --sarsa-hit-mode f32 \
  --append --out EVAL.json --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -3
echo "=== EVAL cornell rerun (new protocol) ==="
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene cornell --append --out EVAL.json \
  --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -3
echo "=== bunny cull recheck ==="
timeout 1200 python -m rlrpt_tpu.tools.scene_bench --scenes bunny --pix-mux 4 \
  --json artifacts/scene_bench_bunny_recheck.json 2>&1 | grep -vi warning
echo "=== final bench.py ==="
timeout 1800 python bench.py 2>&1 | tail -3
echo "=== FINAL DONE ==="
