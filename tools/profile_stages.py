#!/usr/bin/env python
"""Stage-by-stage decomposition of the inference engine cost on the real
chip: forward-only vs +decode vs +top-k gather vs +NMS, per operating
point. Used to target the round-3 perf work (VERDICT.md #1: the
serving->eval drop is pure postprocess).

Timing per CLAUDE.md: fetch a scalar (block_until_ready returns at
enqueue on axon buffers); rotate a pool of distinct device-resident
inputs.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(fn, batches, iters):
    float(fn(batches[0]))  # compile + warm
    float(fn(batches[1 % len(batches)]))
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(batches[i % len(batches)])
    float(acc)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-w6-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pool", type=int, default=3)
    ap.add_argument("--conf-thres", type=float, default=0.01)
    ap.add_argument("--max-candidates", type=int, default=4096)
    ap.add_argument("--stages", default="fwd,decode,topk,nms",
                    help="comma list: fwd decode topk nms nms_xla raws")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    dtype = jnp.bfloat16
    spec = zoo.get_spec(args.model)
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    variables = jax.device_put(variables)

    def fwd(v, x):
        return model.apply(v, x.astype(dtype) / 255.0, train=False)

    def stage_fwd(v, x):
        raws = fwd(v, x)
        return sum(r.astype(jnp.float32).sum() for r in raws)

    def stage_decode(v, x):
        pred = decode(fwd(v, x), spec)
        return pred.astype(jnp.float32).sum()

    def stage_topk(v, x):
        pred = decode(fwd(v, x), spec)
        k = min(args.max_candidates, pred.shape[1])
        boxes, conf, cls, nms_boxes, valid, top_idx, n_gated = \
            NMS._gather_candidates_planar(
                pred, nc=spec.nc, conf_thres=args.conf_thres, k=k,
                agnostic=False)
        return (boxes.sum() + conf.sum()
                + nms_boxes.sum()).astype(jnp.float32)

    def _all_fields(d):
        # sum EVERY Detections field (bench.py protocol): summing only
        # boxes+scores lets XLA dead-code the landmark/extras gather —
        # the round-3 lesson; the un-fixed version of this stage made
        # the engine look ~25% faster than the honest bench
        return (d.boxes.sum() + d.scores.sum() + d.classes.sum()
                + d.extras.astype(jnp.float32).sum()
                + d.valid.sum() + d.n_gated.sum())

    def stage_nms(v, x, backend="auto"):
        pred = decode(fwd(v, x), spec)
        d = NMS.non_max_suppression(
            pred, args.conf_thres, 0.5, nc=spec.nc, nkpt=spec.nkpt,
            max_candidates=args.max_candidates, max_det=300,
            backend=backend)
        return _all_fields(d)

    def stage_raws(v, x):
        raws = model.apply(v, x.astype(dtype) / 255.0, train=False,
                           reshape_heads=False)
        d = NMS.non_max_suppression_from_raws(
            raws, spec, args.conf_thres, 0.5,
            max_candidates=args.max_candidates, max_det=300)
        return _all_fields(d)

    stages = {
        "fwd": stage_fwd,
        "decode": stage_decode,
        "topk": stage_topk,
        "nms": stage_nms,
        "nms_xla": lambda v, x: stage_nms(v, x, backend="xla"),
        "raws": stage_raws,
    }

    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(
        0, 255, (args.batch, args.img_size, args.img_size, 3), np.uint8))
        for _ in range(args.pool)]
    jax.block_until_ready(batches)

    out = {"model": args.model, "img_size": args.img_size,
           "batch": args.batch, "conf": args.conf_thres,
           "k": args.max_candidates}
    for name in args.stages.split(","):
        f = jax.jit(stages[name])
        dt = measure(lambda b, f=f: f(variables, b), batches, args.iters)
        ips = args.batch * args.iters / dt
        out[name] = {"ms_per_batch": round(1000 * dt / args.iters, 2),
                     "img_per_sec": round(ips, 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
