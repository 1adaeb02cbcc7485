#!/usr/bin/env python
"""Per-segment decomposition of the forward pass on the real chip.

The forward is measured at a series of truncation points (YoloFace's
`up_to` hook: stop after node i and reduce every live tensor to a
scalar so nothing dead-codes). The delta between consecutive points is
that node range's cost, compared against its own roofline from XLA's
cost analysis — the tool for locating WHERE tiny-face's gap to its HBM
floor lives (round-3 verdict: tiny engine 45 ms vs 26.5 floor, 59%,
undecomposed).

    python tools/profile_layers.py --model yolov7-tiny-face \
        --batch 128 --points auto:8

Caveat (CLAUDE.md): each truncation point is its own remote compile —
keep the point count modest over the relay; run in background.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PEAK_TF = 197e12
PEAK_BW = 819e9


def measure(fn, batches, iters):
    float(fn(batches[0]))  # compile + warm
    float(fn(batches[1 % len(batches)]))
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(batches[i % len(batches)])
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pool", type=int, default=3)
    ap.add_argument("--points", default="auto:8",
                    help="comma list of node indices, or auto:N for N "
                         "roughly equal-flop segments")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--warmup", type=float, default=60,
                    help="seconds of matmul burn before the first timed "
                         "point (cold-clock guard); 0 disables")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model

    dtype = jnp.bfloat16
    spec = zoo.get_spec(args.model).resolve()
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    variables = jax.device_put(variables)
    n_nodes = len(spec.nodes)

    if args.points.startswith("auto:"):
        n = int(args.points.split(":")[1])
        pts = sorted({round((i + 1) * (n_nodes - 1) / n)
                      for i in range(n)})
    else:
        pts = sorted({int(p) for p in args.points.split(",")})
    pts = [p for p in pts if p < n_nodes - 1] + [n_nodes - 1]

    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(
        0, 255, (args.batch, args.img_size, args.img_size, 3), np.uint8))
        for _ in range(args.pool)]
    jax.block_until_ready(batches)

    if args.warmup > 0 and args.platform != "cpu":
        # cold-clock guard (measured 2026-08-18: the first point of a
        # fresh process read 72 ms for a segment that re-measures at
        # 17.6 warm, making cumulative times non-monotonic) — burn the
        # chip up to clock speed before the first timed point
        import time as _t
        x = jax.device_put(jnp.ones((4096, 4096), jnp.bfloat16))
        t0 = _t.time()
        while _t.time() - t0 < args.warmup:
            x = x @ x * 1e-4
            float(x.sum())

    def trunc(i):
        def f(v, x):
            out = model.apply(v, x.astype(dtype) / 255.0, train=False,
                              up_to=i)
            # the head returns its raw list; reduce it the same way
            if isinstance(out, (list, tuple)):
                out = sum(r.astype(jnp.float32).sum() for r in out)
            return out
        return f

    rows, prev = [], {"ms": 0.0, "gflops": 0.0, "gbytes": 0.0, "i": -1}
    for i in pts:
        f = jax.jit(trunc(i))
        lowered = f.lower(variables, batches[0])
        ca = lowered.compile().cost_analysis()
        ms = 1000 * measure(lambda b, f=f: f(variables, b), batches,
                            args.iters)
        g_f = ca.get("flops", 0.0) / 1e9
        g_b = ca.get("bytes accessed", 0.0) / 1e9
        d_ms = ms - prev["ms"]
        d_f, d_b = g_f - prev["gflops"], g_b - prev["gbytes"]
        floor = max(1000 * d_f * 1e9 / PEAK_TF,
                    1000 * d_b * 1e9 / PEAK_BW)
        row = {
            "nodes": f"{prev['i'] + 1}..{i}",
            "ops": "+".join(dict.fromkeys(
                n.op for n in spec.nodes[prev["i"] + 1:i + 1])),
            "cum_ms": round(ms, 2), "d_ms": round(d_ms, 2),
            "d_gflops": round(d_f, 1), "d_gbytes": round(d_b, 2),
            "d_floor_ms": round(floor, 2),
            "efficiency": round(floor / d_ms, 3) if d_ms > 0 else None,
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        prev = {"ms": ms, "gflops": g_f, "gbytes": g_b, "i": i}

    print(json.dumps({
        "model": args.model, "img_size": args.img_size,
        "batch": args.batch, "total_ms": rows[-1]["cum_ms"],
        "segments": rows}))


if __name__ == "__main__":
    main()
