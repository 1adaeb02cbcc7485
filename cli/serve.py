#!/usr/bin/env python
"""REST object-detection demo server.

Equivalent surface to the reference Flask demo
(reference utils/flask_rest_api/restapi.py:1-37: POST /v1/object-detection
with an `image` file -> JSON records). Flask is not available in this
environment, so the server is implemented on the standard library's
http.server — zero extra dependencies, same endpoint and response shape.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DETECTOR = None
ARGS = None


def parse_multipart(body: bytes, boundary: bytes):
    """Minimal multipart/form-data parser: returns {name: bytes}."""
    parts = body.split(b"--" + boundary)
    out = {}
    for part in parts:
        if b"\r\n\r\n" not in part:
            continue
        head, _, data = part.partition(b"\r\n\r\n")
        m = re.search(rb'name="([^"]+)"', head)
        if m:
            out[m.group(1).decode()] = data.rstrip(b"\r\n-")
    return out


class Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        if not self.path.startswith("/v1/object-detection"):
            self.send_error(404)
            return
        import cv2

        ctype = self.headers.get("Content-Type", "")
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        if "multipart/form-data" in ctype:
            boundary = ctype.split("boundary=")[-1].encode()
            fields = parse_multipart(body, boundary)
            image_bytes = fields.get("image", b"")
        else:
            image_bytes = body
        img = cv2.imdecode(np.frombuffer(image_bytes, np.uint8),
                           cv2.IMREAD_COLOR)
        if img is None:
            self.send_error(400, "could not decode image")
            return
        rows = DETECTOR.detect_batch([img], ARGS.img_size, kpt=False)[0]
        records = [
            {"xmin": float(r[0]), "ymin": float(r[1]),
             "xmax": float(r[2]), "ymax": float(r[3]),
             "confidence": float(r[4]), "class": int(r[5]),
             "name": "face"}
            for r in rows]
        payload = json.dumps(records).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, fmt, *args):
        print("[serve]", fmt % args)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--host", default="0.0.0.0")
    # (no --micro-batch here: the HTTP handler serves one image per
    # request, and the engine falls back to whole-batch at batch <=
    # micro_batch — the flag would be inert; it lives on the CLIs that
    # actually batch, cli/detect.py and cli/batch_predict.py)
    ap.add_argument("--quantize", action="store_true",
                    help="W8A8 int8 serving (models/quant.py); "
                         "calibrates on the first request, so the "
                         "compile happens then instead of at warmup")
    args = ap.parse_args(argv)

    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    global DETECTOR, ARGS
    ARGS = args
    DETECTOR = FaceDetector(args.model, torch_weights=args.weights,
                            img_sizes=(args.img_size,),
                            conf_thres=args.conf_thres,
                            iou_thres=args.iou_thres,
                            quantize="int8" if args.quantize else None)
    if args.quantize:
        # warmup's zero dummy must not become the calibration batch —
        # the first real request calibrates + compiles instead
        print("[serve] int8: first request calibrates and compiles")
    else:
        DETECTOR.warmup(args.img_size)
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port}"
          f"/v1/object-detection/{args.model}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
