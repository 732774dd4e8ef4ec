#!/bin/bash
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
echo "=== EVAL cornell (new protocol) ==="
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene cornell --append --out EVAL.json \
  --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -20
echo "=== EVAL complex_light_room ==="
timeout 4800 python -m rlrpt_tpu.tools.evaluate --scene complex_light_room --sarsa-frames 10 \
  --nq-frames 24 --append --out EVAL.json --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -20
echo "=== EVAL door_room (RR) ==="
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene door_room --russian-roulette --append \
  --out EVAL.json --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -20
echo "=== EVAL simple_room (f32 hits) ==="
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene simple_room --sarsa-hit-mode f32 --append \
  --out EVAL.json --gt-cache-dir artifacts/gt_cache 2>&1 | grep -vi warning | tail -20
echo "=== ALL EVALS DONE ==="
