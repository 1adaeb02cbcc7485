#!/usr/bin/env python
"""Roofline position of the forward pass from XLA's own cost analysis:
flops / bytes-accessed of the compiled executable vs v5e peaks
(~197 TF/s bf16, ~819 GB/s HBM). Says whether measured MFU is layout
slop or an HBM-bound ceiling."""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PEAK_TF = 197e12
PEAK_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-w6-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured ms/batch to compare against")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model

    dtype = jnp.bfloat16
    spec = zoo.get_spec(args.model)
    model, variables = init_model(spec, img_size=64, dtype=dtype)

    def fwd(v, x):
        raws = model.apply(v, x.astype(dtype) / 255.0, train=False)
        return sum(r.astype(jnp.float32).sum() for r in raws)

    x = jax.ShapeDtypeStruct(
        (args.batch, args.img_size, args.img_size, 3), jnp.uint8)
    v_shape = jax.eval_shape(lambda: variables)
    compiled = jax.jit(fwd).lower(v_shape, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    t_flops_ms = 1000 * flops / PEAK_TF
    t_bytes_ms = 1000 * bytes_acc / PEAK_BW
    out = {
        "model": args.model, "img_size": args.img_size,
        "batch": args.batch,
        "gflops_per_batch": round(flops / 1e9, 1),
        "gbytes_per_batch": round(bytes_acc / 1e9, 2),
        "arith_intensity": round(flops / max(bytes_acc, 1), 1),
        "t_mxu_ms": round(t_flops_ms, 2),
        "t_hbm_ms": round(t_bytes_ms, 2),
        "roofline_ms": round(max(t_flops_ms, t_bytes_ms), 2),
    }
    if args.measured_ms:
        out["measured_ms"] = args.measured_ms
        out["roofline_frac"] = round(
            max(t_flops_ms, t_bytes_ms) / args.measured_ms, 3)
        out["mfu"] = round(t_flops_ms / args.measured_ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
