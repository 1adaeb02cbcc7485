#!/usr/bin/env python
"""Probe the top-k candidate-gather strategies at the eval point's exact
shapes (round-4 verdict #2 follow-up).

The real-graph trace (tools/TRACE_EVAL_bf16.json, xplane 'XLA Ops' line)
shows the w6 eval postprocess residue is NOT the NMS kernel (8.5 ms) or
the sort (2.6 ms) but the four separate per-plane candidate gathers
x/y/w/h [128,25500] -> [128,4096] at ~6.6 ms EACH (26.5 ms total), plus
15 extras-keeper gathers at 0.39 ms each. This probe measures the
alternatives on-chip:

  cand_separate   4x take_along_axis on (B, N) planes     [current]
  cand_packed     1x take_along_axis on (B, N, 4), idx[..., None]
  cand_flat       1x take_along_axis on (B, 4N) with fused idx math
  cand_cosort     lax.sort((key, x, y, w, h), num_keys=1)[:, :K]
  keep_separate   15x take_along_axis (B, N) planes, 300 idx [current]
  keep_packed     1x take_along_axis on (B, N, 15), idx[..., None]

Timing per CLAUDE.md rules: pool of distinct device-resident inputs,
enqueue loop + scalar fetch, warmup, first-point burn.

    python tools/probe_gather.py --iters 16
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).parent / "GATHER_PROBE.json"


def measure(fn, pools, iters):
    """fn(*pools[i]) -> array; returns ms/iter after warmup."""
    float(fn(*pools[0]).sum())
    float(fn(*pools[1 % len(pools)]).sum())
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        acc = fn(*pools[i % len(pools)])
    float(acc.sum())
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=25500)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--extras", type=int, default=15)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--pool", type=int, default=3)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--warmup", type=float, default=30)
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

    B, N, K, E, M = args.batch, args.n, args.k, args.extras, args.max_det
    rng = np.random.default_rng(0)

    def make_pools(n_planes, idx_width):
        """pools of (planes (B,N,n_planes) f32, idx (B,idx_width) i32);
        indices drawn WITHOUT order (top_k emits value-sorted, scattered
        positions) from the full [0, N) range."""
        out = []
        for _ in range(args.pool):
            planes = jax.device_put(np.asarray(
                rng.normal(0, 1, (B, N, n_planes)), np.float32))
            idx = jax.device_put(np.stack(
                [rng.choice(N, idx_width, replace=False)
                 for _ in range(B)]).astype(np.int32))
            out.append((planes, idx))
        import jax as _j
        _j.block_until_ready(out)
        return out

    pools4 = make_pools(4, K)
    poolsE = make_pools(E, M)
    results = {}

    # ---- candidate stage: (B, N) x4 -> (B, K) x4 ----
    @jax.jit
    def cand_separate(planes, idx):
        outs = [jnp.take_along_axis(planes[..., c], idx, axis=1)
                for c in range(4)]
        return jnp.stack(outs, axis=-1)

    @jax.jit
    def cand_packed(planes, idx):
        return jnp.take_along_axis(planes, idx[..., None], axis=1)

    @jax.jit
    def cand_flat(planes, idx):
        flat = planes.reshape(B, N * 4)
        gidx = (idx[..., None] * 4 + jnp.arange(4)[None, None, :]) \
            .reshape(B, K * 4)
        return jnp.take_along_axis(flat, gidx, axis=1).reshape(B, K, 4)

    @jax.jit
    def cand_cosort(planes, idx):
        # idx unused: co-sort moves payloads during the key sort
        key = planes[..., 0]
        ops = jax.lax.sort(
            (-key, planes[..., 0], planes[..., 1], planes[..., 2],
             planes[..., 3]), dimension=1, num_keys=1)
        return jnp.stack([o[:, :K] for o in ops[1:]], axis=-1)

    results["cand_separate_ms"] = round(
        measure(cand_separate, pools4, args.iters), 3)
    results["cand_packed_ms"] = round(
        measure(cand_packed, pools4, args.iters), 3)
    results["cand_flat_ms"] = round(
        measure(cand_flat, pools4, args.iters), 3)
    results["cand_cosort_ms"] = round(
        measure(cand_cosort, pools4, args.iters), 3)

    # ---- keeper extras stage: (B, N) xE -> (B, M) xE ----
    @jax.jit
    def keep_separate(planes, idx):
        outs = [jnp.take_along_axis(planes[..., c], idx, axis=1)
                for c in range(E)]
        return jnp.stack(outs, axis=-1)

    @jax.jit
    def keep_packed(planes, idx):
        return jnp.take_along_axis(planes, idx[..., None], axis=1)

    results["keep_separate_ms"] = round(
        measure(keep_separate, poolsE, args.iters), 3)
    results["keep_packed_ms"] = round(
        measure(keep_packed, poolsE, args.iters), 3)

    result = {"batch": B, "n": N, "k": K, "max_det": M, "extras": E,
              "iters": args.iters, **results}
    OUT.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
