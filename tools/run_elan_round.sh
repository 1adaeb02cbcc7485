#!/bin/bash
# One-shot fused-ELAN measurement round (fire when the axon relay is up).
# Phase 1: early block elan@3@160 at th=32 — re-baselined XLA (bias-
#   perturbation protocol) + the full variant stack.
# Phase 2: deep block elan@21@40 at th=10 — XLA + grouped variant.
# Appends rows to tools/ELAN_AB.json; each compile can take 10-20 min.
set -x
cd "$(dirname "$0")/.."
python tools/bench_elan.py --skip-engine --only 3 --th 32 --reps 16 --iters 10 \
  --kernels flat+im2col,flat+im2col9+ab+ct,flat+im2col9+ab+ct+nopad
python tools/bench_elan.py --skip-engine --only 21 --th 10 --reps 16 --iters 10 \
  --kernels flat+im2col9+ab+ct,flat+im2col9+ab+ct+g4
