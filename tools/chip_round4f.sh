#!/bin/bash
# Round-4 chip batch 4f: pin the 1280 eval-point variance (PERF.md §3d
# flagged 116 vs 203 across runs) with three same-config repeats.
cd /root/repo
mkdir -p chiplogs
set -x
date
for i in 1 2 3; do
  timeout 4800 python bench.py --img-size 1280 --batch 32 --micro-batch 8 \
    --conf-thres 0.01 --max-candidates 4096 --iters 10 --pool 2 \
    > chiplogs/p1280_eval_rep$i.json 2> chiplogs/p1280_eval_rep$i.err
  date
done
