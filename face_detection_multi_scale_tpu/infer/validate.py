"""Validation: P / R / mAP@.5 / mAP@.5:.95 over a dataset.

Equivalent of the reference test.py `test()` (reference test.py:41-379):
batched forward + NMS at conf 0.001 / IoU 0.6, predictions rescaled to
native image space, greedy IoU-ladder matching, ap_per_class.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import numpy as np

from face_detection_multi_scale_tpu.data.dataset import (
    DataLoader, FaceDataset)
from face_detection_multi_scale_tpu.data.letterbox import scale_coords
from face_detection_multi_scale_tpu.eval.metrics import (
    IOUV, ap_per_class, match_predictions)
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.models.spec import ModelSpec
from face_detection_multi_scale_tpu.ops import nms as NMS
from face_detection_multi_scale_tpu.ops.boxes import xywh2xyxy


def validate(model, variables, dataset: FaceDataset, *,
             batch_size: int = 32, conf_thres: float = 0.001,
             iou_thres: float = 0.6, max_det: int = 300,
             augment: bool = False, flip_test: bool = False,
             verbose: bool = True) -> Dict[str, float]:
    """Run the mAP protocol; labels come from the dataset (normalized to
    the letterboxed frame), predictions and GT are both mapped to native
    space before matching (test.py:172-279)."""
    spec: ModelSpec = model.spec

    from face_detection_multi_scale_tpu.infer.augment import (
        forward_augment, forward_flip_test)

    @jax.jit
    def run(variables, images_u8):
        x = images_u8.astype(np.float32) / 255.0
        if augment:
            preds = forward_augment(model, variables, x)
        elif flip_test:
            preds = forward_flip_test(model, variables, x)
        else:
            raws = model.apply(variables, x, train=False)
            preds = decode(raws, spec)
        return NMS.non_max_suppression(
            preds, conf_thres, iou_thres, nc=spec.nc, nkpt=spec.nkpt,
            max_candidates=4096, max_det=max_det)

    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)
    stats = []
    gated_counts = []
    t_infer = 0.0
    n_images = 0
    for images, labels, paths, shapes in loader:
        # (h_in, w_in) is the network input frame: the square img_size by
        # default, or the per-batch rect shape when the dataset was built
        # with rect=True (one compiled executable per distinct shape)
        h_in, w_in = images.shape[1:3]
        t0 = time.perf_counter()
        dets = run(variables, images)
        rows_list = NMS.detections_to_numpy(dets)
        t_infer += time.perf_counter() - t0
        if dets.n_gated is not None:
            gated_counts.extend(np.asarray(dets.n_gated).tolist())
        for bi, rows in enumerate(rows_list):
            n_images += 1
            (h0, w0), ((rh, rw), pad) = shapes[bi]
            l = labels[labels[:, 0] == bi]
            tcls = l[:, 1]
            pred = rows[:, :6].astype(np.float64).copy()
            if len(pred):
                scale_coords((h_in, w_in), pred[:, :4],
                             (h0, w0), ratio_pad=((rh, rw), pad))
            if len(l):
                tbox = np.asarray(xywh2xyxy(
                    l[:, 2:6] * [w_in, h_in, w_in, h_in]))
                tbox = scale_coords((h_in, w_in),
                                    tbox.astype(np.float64), (h0, w0),
                                    ratio_pad=((rh, rw), pad))
                correct = match_predictions(pred, tbox, tcls)
            else:
                correct = np.zeros((len(pred), len(IOUV)), bool)
            stats.append((correct, pred[:, 4] if len(pred) else
                          np.zeros(0), pred[:, 5] if len(pred) else
                          np.zeros(0), tcls))

    out = {"mp": 0.0, "mr": 0.0, "map50": 0.0, "map": 0.0,
           "images": n_images,
           "ms_per_image": 1000 * t_infer / max(n_images, 1)}
    if stats:
        tp = np.concatenate([s[0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        pcls = np.concatenate([s[2] for s in stats])
        tcls = np.concatenate([s[3] for s in stats])
        if tp.size and tcls.size:
            p, r, ap, f1, _ = ap_per_class(tp, conf, pcls, tcls)
            out.update(mp=float(p.mean()), mr=float(r.mean()),
                       map50=float(ap[:, 0].mean()),
                       map=float(ap.mean()))
    trunc = NMS.truncation_stats(gated_counts, 4096)
    out["truncated_images"] = trunc["truncated_images"]
    if verbose:
        print(f"val: {out['images']} images  P {out['mp']:.4f}  "
              f"R {out['mr']:.4f}  mAP50 {out['map50']:.4f}  "
              f"mAP {out['map']:.4f}  "
              f"{out['ms_per_image']:.1f} ms/img")
        if trunc["truncated_images"]:
            print(f"WARNING: {trunc['truncated_images']}/{trunc['images']} "
                  f"images exceeded the 4096 pre-NMS candidate cap "
                  f"({trunc['dropped_total']} candidates dropped)")
    return out
