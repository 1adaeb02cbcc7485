#!/bin/sh
# Round-5 chip batch B: attribute the eval-point postprocess residue in
# the REAL fused executable (round-4 verdict #2), both dtypes.
# Run from repo root:  sh tools/chip_r5b.sh
set -x
cd /root/repo
timeout 3000 python tools/trace_eval.py --iters 4 \
    > /tmp/trace_eval_bf16.log 2>&1
cp tools/TRACE_EVAL.json tools/TRACE_EVAL_bf16.json 2>/dev/null
timeout 3000 python tools/trace_eval.py --iters 4 --quantize \
    > /tmp/trace_eval_int8.log 2>&1
cp tools/TRACE_EVAL.json tools/TRACE_EVAL_int8.json 2>/dev/null
echo CHIP_R5B_DONE
