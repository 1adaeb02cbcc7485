#!/bin/bash
# Round-4 chip batch 3 (runs after chip_round4b.sh):
#  - tiny-face ENGINE stage decomposition at the serving point (the
#    hypothesis from batch 2's truncation profile: tiny's gap to floor
#    lives in postprocess + relay dispatch, not the convs)
#  - warm re-measure of the anomalous first truncation point (cold-chip
#    clocking suspicion)
#  - train-throughput rows re-measured and recorded into
#    BENCH_SWEEP.json (--record) so the published table keeps both sides
cd /root/repo
mkdir -p chiplogs
set -x
date
timeout 4800 python tools/profile_stages.py --model yolov7-tiny-face \
  --conf-thres 0.25 --max-candidates 1024 --iters 12 \
  > chiplogs/stages_tiny_serving.json 2> chiplogs/stages_tiny_serving.err
date
timeout 2400 python tools/profile_layers.py --model yolov7-tiny-face \
  --batch 128 --points 10 \
  > chiplogs/seg_tiny_p10_warm.json 2> chiplogs/seg_tiny_p10_warm.err
date
timeout 4800 python tools/train_bench.py --model yolov7-tiny-face \
  --batch 128 --dtype bfloat16 --iters 10 --record \
  > chiplogs/train_tiny.json 2> chiplogs/train_tiny.err
date
timeout 4800 python tools/train_bench.py --model yolov7-w6-face \
  --batch 32 --dtype bfloat16 --iters 10 --record \
  > chiplogs/train_w6.json 2> chiplogs/train_w6.err
date
