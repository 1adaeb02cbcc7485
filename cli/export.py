#!/usr/bin/env python
"""Model export CLI (the models/export.py + cpp/export.py surface of the
reference, targeting StableHLO / TF SavedModel instead of ONNX/ncnn)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--format", default="stablehlo",
                    choices=["stablehlo", "savedmodel", "onnx"],
                    help="onnx serializes natively (no extra packages), "
                         "including --export-nms (standard "
                         "NonMaxSuppression ops, dynamic K)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--export-nms", action="store_true", default=None,
                    help="fuse decode + NMS into the artifact (default "
                         "for stablehlo/savedmodel; off for onnx, "
                         "matching the reference's ONNX contract)")
    ap.add_argument("--no-export-nms", dest="export_nms",
                    action="store_false")
    ap.add_argument("--raw-heads", action="store_true",
                    help="per-stride undecoded maps (cpp/export.py mode)")
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--max-det", type=int, default=300)
    args = ap.parse_args(argv)

    from face_detection_multi_scale_tpu import export_model as EM
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.convert import (
        convert_state_dict, load_torch_checkpoint)
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.models.spec import load_spec
    from face_detection_multi_scale_tpu.train.checkpoint import (
        load_inference_weights)

    spec = (load_spec(args.model) if args.model.endswith(".yaml")
            else zoo.get_spec(args.model))
    model, variables = init_model(spec, img_size=64)
    if args.weights:
        variables = (load_inference_weights(args.weights)
                     if args.weights.endswith(".npz") else
                     convert_state_dict(load_torch_checkpoint(args.weights)))

    suffix = {"stablehlo": ".stablehlo", "savedmodel": "_savedmodel",
              "onnx": ".onnx"}[args.format]
    out = args.output or f"{spec.name}_{args.img_size}{suffix}"
    export_nms = (args.export_nms if args.export_nms is not None
                  else args.format != "onnx")
    if args.format == "stablehlo":
        EM.export_stablehlo(
            model, variables, spec, out, img_size=args.img_size,
            batch=args.batch_size, include_postprocess=export_nms,
            raw_heads=args.raw_heads, conf_thres=args.conf_thres,
            iou_thres=args.iou_thres, max_det=args.max_det)
    elif args.format == "onnx":
        EM.export_onnx(
            model, variables, spec, out, img_size=args.img_size,
            batch=args.batch_size, include_postprocess=export_nms,
            raw_heads=args.raw_heads, conf_thres=args.conf_thres,
            iou_thres=args.iou_thres, max_det=args.max_det)
    else:
        EM.export_savedmodel(
            model, variables, spec, out, img_size=args.img_size,
            batch=args.batch_size, include_postprocess=export_nms,
            conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            max_det=args.max_det)
    print(f"exported -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
