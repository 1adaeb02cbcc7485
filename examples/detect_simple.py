#!/usr/bin/env python
"""Minimal single-image face detection — the reference detect_simple.py
(detect_simple.py:1-173) distilled to its essence on the TPU stack:
load one image, letterbox, one fused forward + NMS, draw boxes and
5-point landmarks, save.

    python examples/detect_simple.py --image face.jpg \
        [--weights yolov7-w6-face.pt] [--model yolov7-tiny-face]

Everything heavier (directories, videos, webcams/RTSP, batching, label
txts) lives in cli/detect.py; this file stays a readable 50-line recipe.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--weights", default=None,
                    help="reference .pt / stripped .npz (random init "
                         "weights if omitted — demo only)")
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--output", default=None,
                    help="default: <image>_det<ext>")
    args = ap.parse_args(argv)

    import cv2

    from face_detection_multi_scale_tpu.infer.detector import FaceDetector
    from face_detection_multi_scale_tpu.utils.plotting import (
        draw_detections)

    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"could not read {args.image}")

    det = FaceDetector(args.model, torch_weights=args.weights,
                       img_sizes=(args.img_size,),
                       conf_thres=args.conf_thres,
                       iou_thres=args.iou_thres)
    t0 = time.time()
    rows = det.detect_batch([img], args.img_size, kpt=True)[0]
    print(f"{len(rows)} faces in {time.time() - t0:.3f}s "
          f"(includes one-time compile)")
    draw_detections(img, rows, nkpt=5)
    out = args.output or str(
        Path(args.image).with_stem(Path(args.image).stem + "_det"))
    cv2.imwrite(out, img)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
