#!/usr/bin/env python
"""WIDER FACE val-set prediction writer.

Equivalent surface to the reference test_widerface.py (test_widerface.py:
31-145): reads `wider_val.txt` next to the dataset folder, runs the model
over every image, and writes per-image prediction txts in the exact format
the official evaluation consumes (name line, count line, `x1 y1 w h conf`
rows with int(+0.5) rounding — test_widerface.py:88-114). Default operating
point conf 0.01 / IoU 0.5 (test_widerface.py:124-125).

TPU-native difference: images are bucketed by their letterboxed shape and
executed in batches, one compiled executable per bucket shape, instead of
the reference's per-image loop.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--model", default="yolov7-w6-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf-thres", type=float, default=0.01)
    ap.add_argument("--iou-thres", type=float, default=0.5)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--dataset_folder", default="data/widerface/val/images/")
    ap.add_argument("--save_folder", default="widerface_evaluate/widerface_txt/")
    ap.add_argument("--kpt-label", type=int, default=5)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    # the reference NMS admits 30000 pre-NMS boxes and keeps all survivors
    # (utils/general.py:518-524); at conf 0.01 crowded hard-set images
    # need generous fixed capacities to avoid recall loss
    ap.add_argument("--max-det", type=int, default=4096)
    ap.add_argument("--max-candidates", type=int, default=16384)
    ap.add_argument("--device-preprocess", action="store_true",
                    help="letterbox + BGR->RGB + /255 on device, fused "
                         "into the network executable (raw frames "
                         "bucketed by ORIGINAL shape); differs from the "
                         "cv2 letterbox by <=2/255 per pixel — the AP "
                         "delta is recorded in AP_PARITY.md")
    ap.add_argument("--quantize", action="store_true",
                    help="W8A8 int8 serving (models/quant.py), "
                         "calibrated on the first batch — use with the "
                         "eval protocol to measure the int8 AP delta")
    args = ap.parse_args(argv)

    import cv2
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.data.letterbox import (
        letterbox, scale_coords)
    from face_detection_multi_scale_tpu.eval.widerface import write_pred_file
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector
    from face_detection_multi_scale_tpu.ops.nms import detections_to_numpy

    det = FaceDetector(args.model, torch_weights=args.weights,
                       img_sizes=(args.img_size,),
                       conf_thres=args.conf_thres, iou_thres=args.iou_thres,
                       max_det=args.max_det,
                       max_candidates=args.max_candidates,
                       quantize="int8" if args.quantize else None,
                       dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                       else jnp.float32)

    testset_list = args.dataset_folder[:-7] + "wider_val.txt"
    with open(testset_list) as f:
        names = f.read().split()
    print(f"{len(names)} val images")

    # bucket so each bucket is one compiled executable: by letterboxed
    # (auto=True) shape for the host-cv2 path, by ORIGINAL raw shape for
    # the fused device-preprocess path (the letterbox then runs inside
    # the executable and its geometry is static per raw shape)
    t0 = time.time()
    buckets = defaultdict(list)
    for name in names:
        path = args.dataset_folder + name
        img0 = cv2.imread(path)
        if img0 is None:
            print(f"WARNING: unreadable {path}")
            continue
        if args.device_preprocess:
            buckets[img0.shape[:2]].append((name, img0.shape, img0))
        else:
            lb = letterbox(img0, args.img_size, stride=det.stride,
                           auto=True)[0]
            buckets[lb.shape[:2]].append((name, img0.shape, lb))

    n_written = 0
    gated_counts = []
    for shape, items in sorted(buckets.items(), key=lambda kv: -len(kv[1])):
        if args.device_preprocess:
            run, geom = det._executable_dev(shape, args.img_size,
                                            auto=True)
            inp_hw = geom.out_hw
        for i in range(0, len(items), args.batch_size):
            chunk = items[i:i + args.batch_size]
            if args.device_preprocess:
                batch = np.stack([raw for _, _, raw in chunk])  # BGR;
                # device_letterbox swaps channels on device
                dets = run(det.variables, jnp.asarray(batch))
            else:
                batch = np.stack([
                    np.ascontiguousarray(lb[:, :, ::-1])
                    for _, _, lb in chunk])
                dets = det.run_network(batch)
                inp_hw = shape
            gated_counts.extend(
                np.asarray(dets.n_gated)[:len(chunk)].tolist())
            rows_list = detections_to_numpy(dets)
            for (name, img0_shape, _), rows in zip(chunk, rows_list):
                rows = rows.astype(np.float64)
                if len(rows):
                    scale_coords(inp_hw, rows[:, :4], img0_shape)
                save_name = os.path.join(args.save_folder,
                                         name[:-4] + ".txt")
                write_pred_file(save_name, Path(save_name).stem,
                                rows[:, :5])
                n_written += 1
    print(f"Done. {n_written} txts in {time.time() - t0:.3f}s "
          f"({len(buckets)} shape buckets) -> {args.save_folder}")
    # candidate-truncation telemetry: the reference keeps every gated box
    # (max_nms 30000, utils/general.py:518-524); our fixed capacity drops
    # candidates silently when a crowded image exceeds it — report it
    from face_detection_multi_scale_tpu.ops.nms import truncation_stats
    stats = truncation_stats(gated_counts, args.max_candidates)
    if stats["truncated_images"]:
        print(f"WARNING: {stats['truncated_images']}/{stats['images']} "
              f"images exceeded --max-candidates {args.max_candidates} "
              f"(max gated {stats['max_gated']}, "
              f"{stats['dropped_total']} candidates dropped) — raise "
              f"--max-candidates to recover recall")
    else:
        print(f"candidate truncation: none "
              f"(max gated {stats['max_gated']}/{args.max_candidates})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
