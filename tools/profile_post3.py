#!/usr/bin/env python
"""Round-3 profile #4: planar-gather postprocess variant vs the row-gather
one, at serving and eval points, plus the w6 batch scan with the seq
kernel."""

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
    ap.add_argument("--points", default="0.01:4096,0.25:1024")
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
    batch = args.batch

    def fwd(v, x):
        return model.apply(v, x.astype(dtype) / 255.0, train=False)

    def planar_post(pred, conf_thres, k, max_det=300):
        """Planar variant: coords as (bs, N) lanes, minor-dim
        take_along_axis instead of vmapped row gathers; extras gathered
        only for the final max_det keepers."""
        obj = pred[..., 4].astype(jnp.float32)
        conf = pred[..., 5].astype(jnp.float32) * obj
        gate = (obj > conf_thres) & (conf > conf_thres)
        masked = jnp.where(gate, conf, NMS.NEG_INF)
        top_conf, top_idx = jax.lax.top_k(masked, k)

        cx = pred[..., 0].astype(jnp.float32)
        cy = pred[..., 1].astype(jnp.float32)
        w2 = pred[..., 2].astype(jnp.float32) / 2
        h2 = pred[..., 3].astype(jnp.float32) / 2
        gat = lambda p: jnp.take_along_axis(p, top_idx, axis=1)
        gcx, gcy, gw2, gh2 = gat(cx), gat(cy), gat(w2), gat(h2)
        boxes = jnp.stack([gcx - gw2, gcy - gh2, gcx + gw2, gcy + gh2],
                          axis=-1)
        valid = top_conf > NMS.NEG_INF / 2
        keep = nms_keep_pallas(boxes, valid, 0.5)

        idx = jnp.arange(k)
        pos = jnp.where(keep, idx[None, :], k)
        neg_top, sel = jax.lax.top_k(-pos, max_det)
        sel_valid = (-neg_top) < k
        sel = jnp.where(sel_valid, sel, 0)
        take = lambda p: jnp.take_along_axis(p, sel, axis=1)
        fin_boxes = jnp.take_along_axis(
            boxes, sel[..., None], axis=1)
        fin_conf = jnp.where(sel_valid, take(top_conf), 0.0)
        fin_src = take(top_idx)  # rows into pred for extras

        def ex_one(p, i):
            return p[i, 6:]

        extras = jax.vmap(ex_one)(pred, fin_src)
        return fin_boxes, fin_conf, extras

    rng = np.random.default_rng(0)
    batches = [jax.device_put(rng.integers(
        0, 255, (batch, args.img_size, args.img_size, 3), np.uint8))
        for _ in range(3)]
    jax.block_until_ready(batches)

    out = {"model": args.model, "batch": batch}
    for pt in args.points.split(","):
        conf_s, k_s = pt.split(":")
        conf_thres, k = float(conf_s), int(k_s)

        @jax.jit
        def run_planar(v, x, conf_thres=conf_thres, k=k):
            pred = decode(fwd(v, x), spec)
            b, c, e = planar_post(pred, conf_thres, k)
            return b.sum() + c.sum() + e.astype(jnp.float32).sum()

        @jax.jit
        def run_rows(v, x, conf_thres=conf_thres, k=k):
            pred = decode(fwd(v, x), spec)
            d = NMS.non_max_suppression(
                pred, conf_thres, 0.5, nc=spec.nc, nkpt=spec.nkpt,
                max_candidates=k, max_det=300, backend="pallas")
            return (d.boxes.sum() + d.scores.sum()
                    + d.extras.astype(jnp.float32).sum())

        for name, f in (("planar", run_planar), ("rows", run_rows)):
            dt = measure(lambda b, f=f: f(variables, b), batches,
                         args.iters)
            key = f"{name}@{conf_s}:{k_s}"
            out[key] = {"ms": round(1000 * dt / args.iters, 2),
                        "ips": round(batch * args.iters / dt, 1)}
            print(json.dumps({key: out[key]}), file=sys.stderr,
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
