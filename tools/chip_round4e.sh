#!/bin/bash
# Round-4 chip batch 4e: the tiled giant-scale A/B (infer/tiling.py).
# The tiled top scale runs one image as a b4 batch of 2176px tiles —
# the device-side comparison is bench points at (3840, b1) vs
# (2176, b4): tiled per-IMAGE rate = the b4 row's value / 4 (+ host
# assemble, negligible). w6-face = flagship TTA; yolov7s-face = the
# fast TTA model from the README table.
cd /root/repo
mkdir -p chiplogs
set -x
date
timeout 4800 python bench.py --model yolov7-w6-face --img-size 3840 \
  --batch 1 --iters 6 --pool 2 \
  > chiplogs/t3840_w6_b1.json 2> chiplogs/t3840_w6_b1.err
date
timeout 4800 python bench.py --model yolov7-w6-face --img-size 2176 \
  --batch 4 --iters 6 --pool 2 \
  > chiplogs/t2176_w6_b4.json 2> chiplogs/t2176_w6_b4.err
date
timeout 4800 python bench.py --model yolov7-w6-face --img-size 2176 \
  --batch 8 --iters 6 --pool 2 \
  > chiplogs/t2176_w6_b8.json 2> chiplogs/t2176_w6_b8.err
date
timeout 4800 python bench.py --model yolov7s-face --img-size 3840 \
  --batch 1 --iters 8 --pool 2 \
  > chiplogs/t3840_s_b1.json 2> chiplogs/t3840_s_b1.err
date
timeout 4800 python bench.py --model yolov7s-face --img-size 2176 \
  --batch 4 --iters 8 --pool 2 \
  > chiplogs/t2176_s_b4.json 2> chiplogs/t2176_s_b4.err
date
