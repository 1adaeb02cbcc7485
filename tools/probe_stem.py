#!/usr/bin/env python
"""Pin the tiny-face stem autopsy: is the 0.61-of-floor efficiency of
nodes 0..10 (PERF.md §3c) really sub-128-lane layout padding?

Protocol: isolated 3x3 convs at the stem's shapes, bf16 NHWC, b128.
If the achieved HBM bandwidth (logical bytes / time) collapses as C
drops below 128 while time-per-map stays ~flat, the gap is the (8,128)
tiled layout padding the logical floor doesn't count — structural, not
schedulable. The C=128 row is the lane-full control at identical
spatial dims; `pad128` runs the SAME 32-channel map zero-padded to 128
channels (4x the logical bytes) — if its time is close to the C=32
row's, padding is confirmed directly.

Timing per CLAUDE.md: enqueue loop + one scalar fetch; pool of
distinct device-resident inputs.

    python tools/probe_stem.py --batch 128 --iters 16
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PEAK_BW = 819e9


def measure(fn, batches, iters):
    float(fn(batches[0]))
    float(fn(batches[1 % len(batches)]))
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(batches[i % len(batches)])
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--pool", type=int, default=3)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force cpu (smoke test; the JAX_PLATFORMS env "
                         "var is ignored by this box's sitecustomize)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # (name, H, C_in, C_out, stride) — tiny stem shapes (cfg
    # yolov7-tiny first nodes: 640->320 C3->32, 320->160 32->64, the
    # 160px ELAN at 32/64) plus lane-full controls at matched spatial
    cases = [
        ("conv0_3to32_s2@640", 640, 3, 32, 2),
        ("conv1_32to64_s2@320", 320, 32, 64, 2),
        ("elan_32to32@160", 160, 32, 32, 1),
        ("elan_64to64@160", 160, 64, 64, 1),
        ("ctrl_128to128@160", 160, 128, 128, 1),
        ("ctrl_256to256@80", 80, 256, 256, 1),
        ("pad128_32to32@160", 160, 32, 32, 1),  # zero-padded to 128
    ]

    rng = np.random.default_rng(0)
    rows = []
    for name, h, cin, cout, stride in cases:
        pad = name.startswith("pad128")
        cin_s, cout_s = (128, 128) if pad else (cin, cout)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin_s, cout_s)),
                        jnp.bfloat16)
        if pad:
            # zero the channels beyond the logical 32 so the math
            # matches the unpadded case on the first 32 outputs
            mask_in = (np.arange(cin_s) < cin)[:, None]
            mask_out = (np.arange(cout_s) < cout)[None, :]
            w = w * jnp.asarray(mask_in & mask_out, jnp.bfloat16)

        @jax.jit
        def conv(w, x):
            y = jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            return y.astype(jnp.float32).sum()

        xs = [jax.device_put(jnp.asarray(
            rng.normal(0, 1, (args.batch, h, h, cin_s)), jnp.bfloat16))
            for _ in range(args.pool)]
        jax.block_until_ready(xs)
        dt = measure(lambda x, w=w: conv(w, x), xs, args.iters)

        ho = h // stride
        # logical bytes at the LOGICAL channel counts (what
        # cost-analysis-style floors charge), even for pad128
        gbytes = (args.batch * (h * h * cin + ho * ho * cout) * 2
                  + 3 * 3 * cin * cout * 2) / 1e9
        rows.append({
            "case": name, "ms": round(1000 * dt, 3),
            "logical_gb": round(gbytes, 3),
            "achieved_gbps": round(gbytes / dt, 1),
            "pct_peak_bw": round(100 * gbytes / dt / PEAK_BW * 1e9, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
