#!/bin/bash
# Round-4 chip batch 4d:
#  - 90 s warm-up burn (cold-clock caveat, PERF.md §3c: the first
#    ~minute after relay attach runs slow and poisons first points)
#  - probe_stem: pin the tiny-stem layout-padding autopsy
#  - profile_stages with the FIXED all-fields protocol (tiny serving +
#    w6 eval) and a same-hour bench point for reconciliation
#  - tiny b256 serving (amortization check) and w6@1280 b64/mb8 (does
#    outer batch keep helping past 32?)
cd /root/repo
mkdir -p chiplogs
set -x
date
timeout 600 python - <<'EOF' > chiplogs/warmup.out 2>&1
import time
import jax, jax.numpy as jnp
x = jax.device_put(jnp.ones((4096, 4096), jnp.bfloat16))
t0 = time.time()
while time.time() - t0 < 90:
    x = x @ x * 1e-4
    float(x.sum())
print("warm")
EOF
date
timeout 3600 python tools/probe_stem.py --batch 128 --iters 16 \
  > chiplogs/stem.json 2> chiplogs/stem.err
date
timeout 4800 python tools/profile_stages.py --model yolov7-tiny-face \
  --conf-thres 0.25 --max-candidates 1024 --iters 12 \
  > chiplogs/stages_tiny_honest.json 2> chiplogs/stages_tiny_honest.err
date
timeout 3000 python bench.py --model yolov7-tiny-face --batch 128 \
  --conf-thres 0.25 --max-candidates 1024 --iters 12 --pool 3 \
  > chiplogs/bench_tiny_b128.json 2> chiplogs/bench_tiny_b128.err
date
timeout 4800 python tools/profile_stages.py --model yolov7-w6-face \
  --conf-thres 0.01 --max-candidates 4096 --iters 8 \
  > chiplogs/stages_w6_honest.json 2> chiplogs/stages_w6_honest.err
date
timeout 3000 python bench.py --model yolov7-tiny-face --batch 256 \
  --conf-thres 0.25 --max-candidates 1024 --iters 10 --pool 2 \
  > chiplogs/bench_tiny_b256.json 2> chiplogs/bench_tiny_b256.err
date
timeout 4800 python bench.py --img-size 1280 --batch 64 --micro-batch 8 \
  --iters 8 --pool 2 \
  > chiplogs/p1280_b64mb8.json 2> chiplogs/p1280_b64mb8.err
date
