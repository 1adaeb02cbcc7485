#!/usr/bin/env python
"""Micro-probe: does XLA lower int8 conv/matmul to the v5e int8 MXU path
with a real speedup over bf16? Decides whether a quantized serving mode
is worth building. Shapes mimic a mid-network w6 conv layer."""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(fn, args_pool, iters=20):
    float(fn(*args_pool[0]))
    float(fn(*args_pool[1 % len(args_pool)]))
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(*args_pool[i % len(args_pool)])
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    B, H, W, C, F, K = 32, 80, 80, 256, 256, 3
    flops = 2 * B * H * W * C * F * K * K
    rng = np.random.default_rng(0)

    x_f = rng.standard_normal((B, H, W, C)).astype(np.float32)
    w_f = (rng.standard_normal((K, K, C, F)) * 0.05).astype(np.float32)
    x8 = np.clip(np.round(x_f * 16), -127, 127).astype(np.int8)
    w8 = np.clip(np.round(w_f * 300), -127, 127).astype(np.int8)

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv_bf16(x, w):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (1, 1), "SAME", dimension_numbers=dn)
        return y.astype(jnp.float32).sum()

    @jax.jit
    def conv_int8(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return y.sum()

    @jax.jit
    def dot_bf16(x, w):
        y = jnp.dot(x.reshape(-1, C).astype(jnp.bfloat16),
                    w[K // 2, K // 2].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y.sum()

    @jax.jit
    def dot_int8(x, w):
        y = jax.lax.dot_general(
            x.reshape(-1, C), w[K // 2, K // 2],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return y.sum()

    pools = {
        "conv_bf16": ([(jax.device_put(x_f), jax.device_put(w_f))], conv_bf16),
        "conv_int8": ([(jax.device_put(x8), jax.device_put(w8))], conv_int8),
        "dot_bf16": ([(jax.device_put(x_f), jax.device_put(w_f))], dot_bf16),
        "dot_int8": ([(jax.device_put(x8), jax.device_put(w8))], dot_int8),
    }
    out = {"shape": [B, H, W, C, F, K], "gflop": round(flops / 1e9, 1)}
    for name, (pool, fn) in pools.items():
        try:
            dt = measure(fn, pool)
            tf = flops / dt / 1e12 if name.startswith("conv") else \
                2 * B * H * W * C * F / dt / 1e12
            out[name] = {"ms": round(1000 * dt, 3),
                         "tflops": round(tf, 1)}
        except Exception as e:  # noqa: BLE001 — record lowering failures
            out[name] = {"error": str(e)[:200]}
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
