#!/usr/bin/env python
"""Round-3 profile #3: the seq Pallas kernel in and out of the full
pipeline, plus isolated gather/select costs at the eval operating point."""

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
                    default="nms_seq_full,iso_seq,iso_fix,gather_rows")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS
    from face_detection_multi_scale_tpu.ops.pallas_nms import (
        nms_keep_pallas)

    dtype = jnp.bfloat16
    spec = zoo.get_spec(args.model)
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    variables = jax.device_put(variables)
    conf_thres, k, batch = args.conf_thres, args.k, args.batch

    def fwd(v, x):
        return model.apply(v, x.astype(dtype) / 255.0, train=False)

    def stage_nms_full(v, x):
        pred = decode(fwd(v, x), spec)
        d = NMS.non_max_suppression(
            pred, conf_thres, 0.5, nc=spec.nc, nkpt=spec.nkpt,
            max_candidates=k, max_det=300, backend="pallas")
        return d.boxes.sum() + d.scores.sum()

    def stage_gather_rows(v, x):
        pred = decode(fwd(v, x), spec)
        obj = pred[..., 4]
        conf = pred[..., 5] * obj
        gate = (obj > conf_thres) & (conf > conf_thres)
        masked = jnp.where(gate, conf, NMS.NEG_INF)
        top_conf, top_idx = jax.lax.top_k(masked, k)

        def one(p, idx):
            return p[idx, :4]

        boxes = jax.vmap(one)(pred, top_idx)
        return boxes.sum() + top_conf.astype(jnp.float32).sum()

    rng = np.random.default_rng(0)
    model_batches = [jax.device_put(rng.integers(
        0, 255, (batch, args.img_size, args.img_size, 3), np.uint8))
        for _ in range(3)]

    # isolated NMS inputs: sorted synthetic candidates, all valid
    xy = rng.uniform(0, 600, (batch, k, 2)).astype(np.float32)
    wh = rng.uniform(5, 150, (batch, k, 2)).astype(np.float32)
    iso_boxes = jax.device_put(np.concatenate([xy, xy + wh], -1))
    iso_valid = jax.device_put(np.ones((batch, k), bool))
    jax.block_until_ready([model_batches, iso_boxes, iso_valid])

    def iso(version):
        @jax.jit
        def run(b, v):
            return nms_keep_pallas(b, v, 0.5,
                                   kernel_version=version).sum()
        return lambda _=None: run(iso_boxes, iso_valid)

    out = {"model": args.model, "batch": batch, "conf": conf_thres,
           "k": k}
    for name in args.stages.split(","):
        if name == "iso_seq":
            f, batches = iso("seq"), [None]
        elif name == "iso_fix":
            f, batches = iso("fixpoint"), [None]
        else:
            fn = {"nms_seq_full": stage_nms_full,
                  "gather_rows": stage_gather_rows}[name]
            jf = jax.jit(fn)
            f, batches = (lambda b, jf=jf: jf(variables, b)), model_batches
        dt = measure(f, batches, args.iters)
        out[name] = {"ms_per_batch": round(1000 * dt / args.iters, 2),
                     "img_per_sec": round(batch * args.iters / dt, 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
