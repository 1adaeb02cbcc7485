#!/usr/bin/env python
"""Round-3 profile #5: landmark-gather strategies at the sel stage.

A = flat single gather over (bs, N*E) (current _select_kept_planar)
B = per-channel take_along_axis, E gathers over (bs, N)
C = per-channel gathers at the K stage then select (E gathers (bs,N)->k)
D = no extras (lower bound)
Measured per (model, conf, k) point with the full engine around it.
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
    float(fn(batches[0]))
    float(fn(batches[1 % len(batches)]))
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(batches[i % len(batches)])
    float(acc)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--variants", default="A,B,C,D")
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
    conf_thres, k, batch, max_det = args.conf_thres, args.k, args.batch, 300
    nc = spec.nc

    def common(v, x):
        pred = decode(model.apply(v, x.astype(dtype) / 255.0,
                                  train=False), spec)
        obj = pred[..., 4]
        conf = pred[..., 5] * obj
        gate = (obj > conf_thres) & (conf > conf_thres)
        masked = jnp.where(gate, conf, NMS.NEG_INF)
        top_conf, top_idx = jax.lax.top_k(masked, k)
        take = lambda p: jnp.take_along_axis(p, top_idx, axis=1)
        cx, cy = take(pred[..., 0]), take(pred[..., 1])
        w2, h2 = take(pred[..., 2]) / 2, take(pred[..., 3]) / 2
        boxes = jnp.stack([cx - w2, cy - h2, cx + w2, cy + h2], axis=-1)
        valid = top_conf > NMS.NEG_INF / 2
        keep = nms_keep_pallas(boxes.astype(jnp.float32), valid, 0.5)
        idx = jnp.arange(k)
        pos = jnp.where(keep, idx[None, :], k)
        neg_top, sel = jax.lax.top_k(-pos, max_det)
        sel_valid = (-neg_top) < k
        sel = jnp.where(sel_valid, sel, 0)
        fin_boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
        fin_conf = jnp.where(sel_valid,
                             jnp.take_along_axis(top_conf, sel, axis=1),
                             0.0)
        fin_src = jnp.take_along_axis(top_idx, sel, axis=1)
        return pred, fin_boxes, fin_conf, fin_src, sel, top_idx

    E = 3 * spec.nkpt

    def variant_A(v, x):
        pred, fb, fc, fin_src, sel, top_idx = common(v, x)
        bs = pred.shape[0]
        flat = pred[..., 5 + nc:].reshape(bs, -1)
        gidx = (fin_src[..., None] * E + jnp.arange(E)).reshape(
            bs, max_det * E)
        extras = jnp.take_along_axis(flat, gidx, axis=1).reshape(
            bs, max_det, E)
        return fb.sum() + fc.sum() + extras.astype(jnp.float32).sum()

    def variant_B(v, x):
        pred, fb, fc, fin_src, sel, top_idx = common(v, x)
        chans = [jnp.take_along_axis(pred[..., 5 + nc + c], fin_src,
                                     axis=1) for c in range(E)]
        extras = jnp.stack(chans, axis=-1)
        return fb.sum() + fc.sum() + extras.astype(jnp.float32).sum()

    def variant_C(v, x):
        pred, fb, fc, fin_src, sel, top_idx = common(v, x)
        chans = [jnp.take_along_axis(
            jnp.take_along_axis(pred[..., 5 + nc + c], top_idx, axis=1),
            sel, axis=1) for c in range(E)]
        extras = jnp.stack(chans, axis=-1)
        return fb.sum() + fc.sum() + extras.astype(jnp.float32).sum()

    def variant_D(v, x):
        pred, fb, fc, fin_src, sel, top_idx = common(v, x)
        return fb.sum() + fc.sum()

    variants = {"A": variant_A, "B": variant_B, "C": variant_C,
                "D": variant_D}

    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(
        0, 255, (batch, args.img_size, args.img_size, 3), np.uint8))
        for _ in range(3)]
    jax.block_until_ready(batches)

    out = {"model": args.model, "batch": batch, "conf": conf_thres,
           "k": k}
    for name in args.variants.split(","):
        f = jax.jit(variants[name])
        dt = measure(lambda b, f=f: f(variables, b), batches, args.iters)
        out[name] = {"ms": round(1000 * dt / args.iters, 2),
                     "ips": round(batch * args.iters / dt, 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
