#!/usr/bin/env python
"""Throughput benchmark: 640px images/sec/chip through the fused
inference engine (uint8 in -> normalize -> backbone/head -> decode ->
on-device NMS -> fixed detections out).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 2000 img/s/chip north star
(BASELINE.json). Run with --smoke for a fast CPU sanity pass.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-friendly configuration")
    args = ap.parse_args()

    if args.smoke:
        args.model, args.img_size, args.batch, args.iters, args.warmup = (
            "yolov7-lite-t", 128, 2, 2, 1)
        args.dtype = "float32"

    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    det = FaceDetector(args.model, img_sizes=(args.img_size,),
                       conf_thres=0.25, iou_thres=0.5, dtype=dtype,
                       max_det=300, max_candidates=2048)

    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 255,
                            (args.batch, args.img_size, args.img_size, 3),
                            dtype=np.uint8)
               for _ in range(2)]

    for i in range(args.warmup):
        jax.block_until_ready(det.run_network(batches[i % 2]).boxes)

    t0 = time.perf_counter()
    outs = []
    for i in range(args.iters):
        outs.append(det.run_network(batches[i % 2]))
    jax.block_until_ready(outs[-1].boxes)
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch * args.iters / dt
    result = {
        "metric": f"{args.model} {args.img_size}px images/sec/chip "
                  f"(batch={args.batch}, {args.dtype}, fused infer+NMS)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 2000.0, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
