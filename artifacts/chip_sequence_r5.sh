#!/bin/bash
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
echo "=== scene_bench (morton, cull pairs) ==="
timeout 2400 python -m rlrpt_tpu.tools.scene_bench --scenes cornell,medieval_house --pix-mux 32 --json artifacts/scene_bench_a.json 2>&1 | grep -v Warning
timeout 2400 python -m rlrpt_tpu.tools.scene_bench --scenes bunny --pix-mux 4 --json artifacts/scene_bench_b.json 2>&1 | grep -v Warning
echo "=== sarsa_bench (incl in-kernel trainer) ==="
timeout 2400 python -m rlrpt_tpu.tools.sarsa_bench 2>&1 | grep -v Warning
echo "=== EVAL cornell ==="
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene cornell --append --out EVAL.json 2>&1 | grep -v Warning | tail -1
echo "=== EVAL complex_light_room ==="
timeout 3600 python -m rlrpt_tpu.tools.evaluate --scene complex_light_room --sarsa-frames 10 --nq-frames 24 --append --out EVAL.json 2>&1 | grep -v Warning | tail -1
echo "=== ALL DONE ==="
