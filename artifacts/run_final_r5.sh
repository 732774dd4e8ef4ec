#!/bin/bash
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
echo "=== EVAL cornell rerun (new protocol, cached GT) ==="
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene cornell --append --out EVAL.json \
  --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -4
echo "=== bunny cull recheck (standalone) ==="
timeout 1200 python -m rlrpt_tpu.tools.scene_bench --scenes bunny --pix-mux 4 \
  --json artifacts/scene_bench_bunny_recheck.json 2>&1 | grep -vi warning
echo "=== final bench.py ==="
timeout 1800 python bench.py 2>&1 | tail -3
echo "=== FINAL DONE ==="
