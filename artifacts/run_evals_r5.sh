#!/bin/bash
# Wait for any running chip probe to release the chip, then run EVAL refreshes.
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
set -x
timeout 2400 python -m rlrpt_tpu.tools.evaluate --scene cornell --append --out EVAL.json 2>&1 | tail -2
timeout 3600 python -m rlrpt_tpu.tools.evaluate --scene complex_light_room --sarsa-frames 10 --nq-frames 24 --append --out EVAL.json 2>&1 | tail -2
