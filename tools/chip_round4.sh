#!/bin/bash
# Round-4 sequential chip work (relay is back). Logs to chiplogs/.
cd /root/repo
mkdir -p chiplogs
set -x
date
# 1. Repair the perf record: full operating-point sweep -> BENCH_SWEEP.json
timeout 7200 python bench.py --sweep > chiplogs/sweep.out 2> chiplogs/sweep.err
date
# 2. The driver-style headline line (flagship-first)
timeout 3600 python bench.py > chiplogs/headline.out 2> chiplogs/headline.err
date
# 3. The deferred fused-ELAN decision round
bash tools/run_elan_round.sh > chiplogs/elan.out 2>&1
date
