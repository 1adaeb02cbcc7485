#!/bin/sh
# Round-5 chip batch C: gather-strategy probe (the measured eval-point
# residue lever), the int8 eval trace (attribute its ~72 ms postprocess
# residue), and the nodes-16..30 probe (round-4 verdict #3).
# Run from repo root:  sh tools/chip_r5c.sh
set -x
cd /root/repo
timeout 3000 python tools/probe_gather.py --iters 16 \
    > /tmp/probe_gather.log 2>&1
timeout 4000 python tools/trace_eval.py --iters 8 --quantize \
    --out tools/TRACE_EVAL_int8.json > /tmp/trace_eval_int8.log 2>&1
timeout 4000 python tools/probe_elan16.py --iters 16 \
    > /tmp/probe_elan16.log 2>&1
echo CHIP_R5C_DONE
