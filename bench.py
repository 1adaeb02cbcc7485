#!/usr/bin/env python
"""Throughput benchmark: 640px images/sec/chip through the fused
inference engine (uint8 normalize -> backbone/head -> grid decode ->
on-device matrix NMS -> detections).

Methodology: the primary number is steady-state engine throughput over
device-resident uint8 batches (rotating pool of distinct inputs),
synchronized by fetching a scalar reduction of the detection output —
on this environment's tunneled TPU, `block_until_ready` returns at
enqueue time, and host<->device bandwidth (~1.5 GB/s through the relay)
is an artifact of the tunnel rather than of v5e hardware, so H2D-included
throughput is also measured and reported as an aux field inside the
metric string.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline is the ratio against the 2000 img/s/chip north star
(BASELINE.json). Run with --smoke for a fast CPU sanity pass.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(fn, fetch, batches, iters):
    accs = [fn(batches[i % len(batches)]) for i in range(2)]
    fetch(accs[-1])  # warmup + sync
    t0 = time.perf_counter()
    accs = [fn(batches[i % len(batches)]) for i in range(iters)]
    fetch(accs[-1])
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--pool", type=int, default=4,
                    help="distinct resident input batches to rotate")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--max-candidates", type=int, default=1024,
                    help="pre-NMS candidate cap (1024 is ample at the "
                         "serving conf threshold)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-friendly configuration")
    args = ap.parse_args()

    if args.smoke:
        args.model, args.img_size, args.batch = "yolov7-lite-t", 128, 2
        args.iters, args.pool, args.dtype = 2, 2, "float32"

    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    spec = zoo.get_spec(args.model)
    model, variables = init_model(spec, img_size=64, dtype=dtype)

    @jax.jit
    def engine(x):
        raws = model.apply(variables, x.astype(dtype) / 255.0, train=False)
        dets = NMS.non_max_suppression(
            decode(raws, spec), args.conf_thres, 0.5, nc=spec.nc,
            nkpt=spec.nkpt, max_candidates=args.max_candidates,
            max_det=300)
        # scalar reduction forces full execution at fetch time
        return dets.boxes.sum() + dets.scores.sum()

    rng = np.random.default_rng(0)
    host_batches = [
        rng.integers(0, 255, (args.batch, args.img_size, args.img_size, 3),
                     dtype=np.uint8) for _ in range(args.pool)]

    # primary: device-resident inputs
    resident = [jax.device_put(b) for b in host_batches]
    jax.block_until_ready(resident)
    dt = measure(engine, float, resident, args.iters)
    resident_ips = args.batch * args.iters / dt

    # aux: H2D included (device_put inside the loop)
    def engine_h2d(b):
        return engine(jax.device_put(b))

    h2d_iters = max(args.iters // 3, 2)
    dt2 = measure(engine_h2d, float, host_batches, h2d_iters)
    h2d_ips = args.batch * h2d_iters / dt2

    result = {
        "metric": (f"{args.model} {args.img_size}px images/sec/chip "
                   f"(batch={args.batch}, {args.dtype}, fused "
                   f"infer+decode+NMS, device-resident inputs; "
                   f"with H2D over tunnel: {h2d_ips:.0f} img/s)"),
        "value": round(resident_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(resident_ips / 2000.0, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
