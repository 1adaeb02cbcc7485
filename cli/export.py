#!/usr/bin/env python
"""Model export CLI (the models/export.py + cpp/export.py surface of the
reference, targeting StableHLO / TF SavedModel instead of ONNX/ncnn)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build_qparams(spec, variables, calib_src: str, img_size: int):
    """Load calibration frames (npz/npy array, or an image dir/glob
    letterboxed to the export size) and run post-training W8A8
    calibration (models/quant.quantize_model; 8 frames max, matching
    FaceDetector.calibrate_int8)."""
    import glob as _glob

    import numpy as np

    from face_detection_multi_scale_tpu.models import quant

    p = Path(calib_src)
    if calib_src.endswith((".npy", ".npz")):
        loaded = np.load(calib_src)
        arr = loaded[loaded.files[0]] if hasattr(loaded, "files") \
            else loaded
    else:
        import cv2

        from face_detection_multi_scale_tpu.data.letterbox import (
            letterbox)
        paths = (sorted(str(f) for f in p.iterdir())
                 if p.is_dir() else sorted(_glob.glob(calib_src)))
        frames = []
        for fp in paths[:8]:
            img = cv2.imread(fp)
            if img is None:
                continue
            rgb = np.ascontiguousarray(img[:, :, ::-1])
            lb = letterbox(rgb, (img_size, img_size), auto=False)[0]
            frames.append(lb)
        if not frames:
            raise SystemExit(f"no readable images in {calib_src}")
        arr = np.stack(frames)
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise SystemExit(
            f"calibration array must be (N, H, W, 3), got {arr.shape}")
    import jax.numpy as jnp
    x = jnp.asarray(arr[:8])
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return quant.quantize_model(spec, variables, x)


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
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="W8A8 int8 ONNX graph (ConvInteger bodies, "
                         "int8 initializers) — the serving mode of "
                         "FaceDetector(quantize='int8'); needs "
                         "--calib-images")
    ap.add_argument("--calib-images", default=None,
                    help="calibration frames for --quantize: a .npy/"
                         ".npz of uint8 NHWC network-input frames, or "
                         "an image directory/glob (letterboxed to "
                         "--img-size); at most 8 frames are used")
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

    qparams = None
    if args.quantize:
        if args.format != "onnx":
            ap.error("--quantize is ONNX-only (stablehlo/savedmodel "
                     "serve the int8 mode live via FaceDetector)")
        if not args.calib_images:
            ap.error("--quantize int8 needs --calib-images")
        qparams = _build_qparams(spec, variables, args.calib_images,
                                 args.img_size)

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
            iou_thres=args.iou_thres, max_det=args.max_det,
            qparams=qparams)
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
