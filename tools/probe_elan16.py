#!/usr/bin/env python
"""Close the w6 nodes-16..30 soft spot (round-4 verdict #3).

PERF.md §3c: the segment nodes 16..30 of yolov7-w6-face @640 b128 runs
at 0.71 of its max(HBM, MXU) floor (20.2 vs 14.3 ms) while every other
segment sits at 0.86-0.98. This probe decides between the two
candidate explanations the way the tiny stem was closed
(tools/probe_stem.py):

  1. per-conv structural (MXU lane/bandwidth character of these exact
     shapes) -> the ISOLATED convs of nodes 17..30, measured one by
     one at their true shapes, already sum to ~the in-graph time;
  2. fusion-boundary / layout cost -> the isolated sum is well below
     the in-graph segment time, and the gap lives between the convs
     (concat materialization, layout flips) -> attackable.

Each conv is measured alone (enqueue loop + scalar fetch, distinct
device-resident input pools, CLAUDE.md timing rules) and compared to
its own max(MXU @76%-lane-capped, HBM) expectation.

    python tools/probe_elan16.py --batch 128 --iters 16
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PEAK_TF = 197e12
PEAK_BW = 819e9
OUT = pathlib.Path(__file__).parent / "ELAN16_PROBE.json"

# (name, spatial_in, c_in, c_out, k, stride) of w6 nodes 17..30 at 640px
# input (ReOrg halves once, node 2 halves again -> nodes 12..19 run at
# 80 px, node 20 downsamples to 40, nodes 21..28 at 40, node 29 -> 20).
# Derived from models/zoo.py get_spec("yolov7-w6-face") (reference
# cfg/yolov7-w6.yaml:16-40).
SHAPES = [
    ("n17 3x3 128->128 @80", 80, 128, 128, 3, 1),
    ("n19 1x1 512->256 @80 (post-concat squeeze)", 80, 512, 256, 1, 1),
    ("n20 3x3 512->512 s2 @80->40", 80, 512, 512, 3, 2),
    ("n21 1x1 512->256 @40", 40, 512, 256, 1, 1),
    ("n23 3x3 256->256 @40", 40, 256, 256, 3, 1),
    ("n24 3x3 256->256 @40", 40, 256, 256, 3, 1),
    ("n25 3x3 256->256 @40", 40, 256, 256, 3, 1),
    ("n26 3x3 256->256 @40", 40, 256, 256, 3, 1),
    ("n28 1x1 1024->512 @40 (post-concat squeeze)", 40, 1024, 512, 1, 1),
    ("n29 3x3 768->768 s2 @40->20", 40, 768, 768, 3, 2),
    ("n30 1x1 768->384 @20", 20, 768, 384, 1, 1),
]
# nodes 16, 18, 22, 27, 31.. are: one more 3x3 128@80 (n16, same as
# n17), the concats (no flops), and the second 1x1 of each split.
EXTRA_DUPES = {"n17 3x3 128->128 @80": 2,   # n16 + n17
               "n21 1x1 512->256 @40": 2}   # n21 + n22


def measure(fn, pool, iters):
    float(fn(pool[0]).sum())
    float(fn(pool[1 % len(pool)]).sum())
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        acc = fn(pool[i % len(pool)])
    float(acc.sum())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--pool", type=int, default=3)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--warmup", type=float, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.warmup > 0 and args.platform != "cpu":
        x = jax.device_put(jnp.ones((4096, 4096), jnp.bfloat16))
        t0 = time.time()
        while time.time() - t0 < args.warmup:
            x = x @ x * 1e-4
            float(x.sum())

    rng = np.random.default_rng(0)

    # per-iteration measurement overhead (relay enqueue + the single
    # scalar fetch, amortized over iters): measured on a ~zero-floor op
    # and SUBTRACTED from every row — at iters=16 it was ~2-3 ms/row and
    # made a 0.15 ms conv read 3.3 ms (first run, 2026-08-19)
    null_pool = [jax.device_put(jnp.ones((8, 128), jnp.float32) * i)
                 for i in range(args.pool)]
    jax.block_until_ready(null_pool)
    null_f = jax.jit(lambda x: x * 1.0001)
    overhead_ms = 1000 * measure(lambda x: null_f(x), null_pool,
                                 args.iters)
    print(json.dumps({"overhead_ms_per_iter": round(overhead_ms, 3)}),
          file=sys.stderr, flush=True)

    rows, iso_sum = [], 0.0
    for name, hw, ci, co, k, s in SHAPES:
        kern = jax.device_put(jnp.asarray(
            rng.normal(0, 0.05, (k, k, ci, co)), jnp.bfloat16))
        pool = [jax.device_put(jnp.asarray(
            rng.normal(0, 1, (args.batch, hw, hw, ci)), jnp.bfloat16))
            for _ in range(args.pool)]
        jax.block_until_ready(pool)

        @functools.partial(jax.jit, static_argnums=())
        def f(x, kern=kern, s=s, k=k):
            pad = (k // 2, k // 2)
            y = jax.lax.conv_general_dilated(
                x, kern, (s, s), [pad, pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.silu(y)

        ms_raw = 1000 * measure(f, pool, args.iters)
        ms = max(ms_raw - overhead_ms, 1e-3)
        ho = hw // s
        flops = 2 * k * k * ci * co * ho * ho * args.batch
        bytes_ = 2 * args.batch * (hw * hw * ci + ho * ho * co) \
            + 2 * k * k * ci * co
        mxu_ms = 1e3 * flops / PEAK_TF
        # lane-capped MXU expectation (probe_stem dose-response:
        # C_out>=256 runs ~76%, 128 ~55%, 64 ~39%)
        cap = {128: 0.55, 64: 0.39, 32: 0.12}.get(min(co, 256), 0.76)
        hbm_ms = 1e3 * bytes_ / PEAK_BW
        expect = max(mxu_ms / cap, hbm_ms)
        dupes = EXTRA_DUPES.get(name, 1)
        iso_sum += ms * dupes
        row = {"shape": name, "ms": round(ms, 3),
               "ms_raw": round(ms_raw, 3),
               "mxu_floor_ms": round(mxu_ms, 3),
               "hbm_floor_ms": round(hbm_ms, 3),
               "lane_capped_expect_ms": round(expect, 3),
               "eff_vs_floor": round(max(mxu_ms, hbm_ms) / ms, 3),
               "x_count_in_segment": dupes}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        # incremental write: a relay stall / timeout must not lose rows
        OUT.write_text(json.dumps({"partial": True, "rows": rows},
                                  indent=1))

    result = {"batch": args.batch, "iters": args.iters,
              "overhead_ms_per_iter": round(overhead_ms, 3),
              "isolated_sum_ms": round(iso_sum, 1),
              "in_graph_segment_ms": 20.2,
              "segment_floor_ms": 14.3,
              "conclusion": (
                  "structural (per-conv character)" if iso_sum > 18.0
                  else "fusion-boundary gap — attackable"),
              "rows": rows}
    OUT.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
