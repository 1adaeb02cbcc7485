#!/usr/bin/env python
"""Micro-probe: what do flat reshapes / tap copies cost inside a Mosaic
kernel?  Isolates the fused-ELAN kernel's matmul-path overheads at
elan@3-like geometry ((36, 176, 128) bf16 strips, N=64) by timing one
pallas kernel per variant over a large grid (per-cell work dominates;
the relay RTT amortizes over the single dispatch):

  pre2d  — dot on an ALREADY 2-D (36*176, 128) resident block: the
           MXU+epilogue floor for this shape
  flat   — same data as (36, 176, 128), one reshape -> dot: the cost
           of the 3-D->2-D collapse alone
  taps   — 9 shifted (34, 174, 128) slices, each pad->reshape->dot,
           f32-accumulated: the fused kernel's taps-mode inner loop
  cat9   — 9 shifted slices flattened then lane-concatenated into one
           (M, 1152) dot: the im2col9 inner loop

Usage: python tools/probe_mosaic_mm.py [--cells 512] [--iters 6]
Writes JSON lines to tools/MOSAIC_MM.json (append).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).parent / "MOSAIC_MM.json"

R, C, K, N = 36, 176, 128, 64
RQ, CQ = R - 2, C - 2          # tap window
CQ16 = CQ + (-CQ % 16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default="pre2d,flat,taps,cat9")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = args.cpu

    def dot2d(a2, w):
        return jax.lax.dot_general(
            a2, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body(variant):
        def kern(x_ref, x2_ref, w_ref, w9_ref, o_ref):
            w = w_ref[...]
            if variant == "pre2d":
                y = dot2d(x2_ref[...], w)
            elif variant == "flat":
                y = dot2d(x_ref[...].reshape(R * C, K), w)
            elif variant == "taps":
                x = x_ref[...]
                acc = None
                for dy in range(3):
                    for dx in range(3):
                        t = x[dy:dy + RQ, dx:dx + CQ, :]
                        t = jnp.pad(t, ((0, 0), (0, CQ16 - CQ), (0, 0)))
                        d = dot2d(t.reshape(RQ * CQ16, K), w)
                        acc = d if acc is None else acc + d
                y = acc
            elif variant == "cat9":
                x = x_ref[...]
                flats = []
                for dy in range(3):
                    for dx in range(3):
                        t = x[dy:dy + RQ, dx:dx + CQ, :]
                        t = jnp.pad(t, ((0, 0), (0, CQ16 - CQ), (0, 0)))
                        flats.append(t.reshape(RQ * CQ16, K))
                y = dot2d(jnp.concatenate(flats, axis=1), w9_ref[...])
            else:
                raise SystemExit(variant)
            o_ref[...] = jnp.sum(y, axis=0, keepdims=True) \
                .astype(o_ref.dtype)

        return pl.pallas_call(
            kern,
            grid=(args.cells,),
            in_specs=[pl.BlockSpec((R, C, K), lambda i: (0, 0, 0)),
                      pl.BlockSpec((R * C, K), lambda i: (0, 0)),
                      pl.BlockSpec((K, N), lambda i: (0, 0)),
                      pl.BlockSpec((9 * K, N), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((args.cells, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(R, C, K) * 0.1, jnp.bfloat16)
    x2 = x.reshape(R * C, K)
    w = jnp.asarray(rng.randn(K, N) * 0.1, jnp.bfloat16)
    w9 = jnp.asarray(rng.randn(9 * K, N) * 0.1, jnp.bfloat16)

    def emit(row):
        print(json.dumps(row), flush=True)
        with OUT.open("a") as fh:
            fh.write(json.dumps(row) + "\n")

    emit({"section": "run", "argv": sys.argv[1:],
          "at": time.strftime("%Y-%m-%dT%H:%M:%S")})
    # FLOPs per cell for context (taps/cat9 do 9x the contraction work
    # of flat at the slightly smaller tap window)
    for variant in args.variants.split(","):
        try:
            fn = jax.jit(lambda a, b, c, d, v=variant:
                         jnp.sum(body(v)(a, b, c, d)))
            float(fn(x, x2, w, w9))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(fn(x, x2, w, w9))
            dt = (time.perf_counter() - t0) / args.iters
            emit({"variant": variant, "cells": args.cells,
                  "us_per_cell": round(dt / args.cells * 1e6, 3),
                  "total_ms": round(dt * 1e3, 3)})
        except Exception as e:
            emit({"variant": variant, "status": "error",
                  "error": repr(e)[:400]})


if __name__ == "__main__":
    main()
