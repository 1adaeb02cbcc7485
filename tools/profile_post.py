#!/usr/bin/env python
"""Surgical decomposition of the w6 eval-point postprocess (round 3):
which of {top-k sort, candidate gathers, NMS backend} owns the ~66 ms
serving->eval tax, and what BN folding does to the forward."""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(fn, batches, iters):
    float(fn(batches[0]))
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
    ap.add_argument("--conf-thres", type=float, default=0.01)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--stages",
                    default="fwd_fused,sort,approx,nms_pallas,nms_xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.fuse import fold_bn
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    dtype = jnp.bfloat16
    spec = zoo.get_spec(args.model)
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    variables = jax.device_put(variables)
    fused = jax.device_put(fold_bn(jax.device_get(variables)))
    conf_thres, k = args.conf_thres, args.k

    def fwd(v, x):
        return model.apply(v, x.astype(dtype) / 255.0, train=False)

    def masked_conf_of(pred):
        obj = pred[..., 4]
        conf = pred[..., 5] * obj  # nc == 1
        gate = (obj > conf_thres) & (conf > conf_thres)
        return jnp.where(gate, conf, NMS.NEG_INF), conf

    def stage_fwd(v, x):
        raws = fwd(v, x)
        return sum(r.astype(jnp.float32).sum() for r in raws)

    def stage_sort(v, x):
        pred = decode(fwd(v, x), spec)
        masked, _ = masked_conf_of(pred)
        top_conf, top_idx = jax.lax.top_k(masked, k)
        return (top_conf.astype(jnp.float32).sum()
                + top_idx.sum().astype(jnp.float32))

    def stage_approx(v, x):
        pred = decode(fwd(v, x), spec)
        masked, _ = masked_conf_of(pred)
        top_conf, top_idx = jax.lax.approx_max_k(
            masked, k, recall_target=0.95, aggregate_to_topk=True)
        return (top_conf.astype(jnp.float32).sum()
                + top_idx.sum().astype(jnp.float32))

    def stage_nms(v, x, backend):
        pred = decode(fwd(v, x), spec)
        d = NMS.non_max_suppression(
            pred, conf_thres, 0.5, nc=spec.nc, nkpt=spec.nkpt,
            max_candidates=k, max_det=300, backend=backend)
        return d.boxes.sum() + d.scores.sum()

    stages = {
        "fwd": lambda v, x: stage_fwd(v, x),
        "fwd_fused": lambda v, x: stage_fwd(v, x),
        "sort": stage_sort,
        "approx": stage_approx,
        "nms_pallas": lambda v, x: stage_nms(v, x, "pallas"),
        "nms_xla": lambda v, x: stage_nms(v, x, "xla"),
    }

    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(
        0, 255, (args.batch, args.img_size, args.img_size, 3), np.uint8))
        for _ in range(3)]
    jax.block_until_ready(batches)

    out = {"model": args.model, "batch": args.batch,
           "conf": conf_thres, "k": k}
    for name in args.stages.split(","):
        f = jax.jit(stages[name])
        v = fused if name == "fwd_fused" else variables
        dt = measure(lambda b, f=f, v=v: f(v, b), batches, args.iters)
        out[name] = {"ms_per_batch": round(1000 * dt / args.iters, 2),
                     "img_per_sec": round(args.batch * args.iters / dt, 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
