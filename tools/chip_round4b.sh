#!/bin/bash
# Round-4 chip batch 2: forward decomposition (verdict item 3), Mosaic
# matmul-rate probe (completes the fused-ELAN autopsy), and the
# w6@1280 micro-batch grid + roofline (verdict item 4).
# Logs to chiplogs/; every tool emits rows incrementally so a relay
# death mid-run keeps what was measured.
cd /root/repo
mkdir -p chiplogs
set -x
date
# 1. Where does tiny's 41% / w6's 25% roofline gap live?
timeout 5400 python tools/profile_layers.py --model yolov7-tiny-face \
  --batch 128 --points auto:8 \
  > chiplogs/seg_tiny.json 2> chiplogs/seg_tiny.err
date
timeout 10800 python tools/profile_layers.py --model yolov7-w6-face \
  --batch 128 --points auto:8 \
  > chiplogs/seg_w6.json 2> chiplogs/seg_w6.err
date
# 2. Mosaic matmul floor at the fused-ELAN strip geometry
timeout 5400 python tools/probe_mosaic_mm.py --cells 512 --iters 6 \
  > chiplogs/mosaic_mm.out 2>&1
date
# 3. w6@1280: the HBM floor at b16, then the micro-batch grid
timeout 2400 python tools/roofline.py --model yolov7-w6-face \
  --img-size 1280 --batch 16 \
  > chiplogs/roofline_1280.json 2> chiplogs/roofline_1280.err
date
timeout 4800 python bench.py --img-size 1280 --batch 32 --micro-batch 8 \
  --iters 12 --pool 2 \
  > chiplogs/p1280_b32mb8.json 2> chiplogs/p1280_b32mb8.err
date
timeout 4800 python bench.py --img-size 1280 --batch 32 --micro-batch 16 \
  --iters 12 --pool 2 \
  > chiplogs/p1280_b32mb16.json 2> chiplogs/p1280_b32mb16.err
date
