"""Multi-checkpoint ensemble inference.

Reference semantics (models/experimental.py:98-141 Ensemble +
attempt_load): multiple models run on the same input and their candidate
sets are concatenated before NMS ("nms ensemble").
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

from face_detection_multi_scale_tpu.infer.detector import FaceDetector
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.ops import nms as NMS


class EnsembleDetector:
    """Wraps several FaceDetectors (possibly different architectures);
    detection candidates concatenate before one shared NMS."""

    def __init__(self, detectors: Sequence[FaceDetector]):
        assert detectors, "need at least one detector"
        self.detectors = list(detectors)
        first = detectors[0]
        self.spec = first.spec
        self.stride = max(d.stride for d in detectors)
        self.conf_thres = first.conf_thres
        self.iou_thres = first.iou_thres
        self.max_det = first.max_det
        self.max_candidates = first.max_candidates

    @classmethod
    def from_weights(cls, model_names: Sequence[str],
                     weights: Sequence[str], **kw) -> "EnsembleDetector":
        return cls([FaceDetector(m, torch_weights=w, **kw)
                    for m, w in zip(model_names, weights)])

    def run_network(self, images_u8: np.ndarray) -> NMS.Detections:
        preds = []
        for det in self.detectors:
            model, spec = det.model, det.spec

            @jax.jit
            def decode_only(variables, x, model=model, spec=spec,
                            dtype=det.dtype):
                raws = model.apply(variables, x.astype(dtype) / 255.0,
                                   train=False)
                return decode(raws, spec)

            preds.append(np.asarray(decode_only(det.variables, images_u8)))
        merged = np.concatenate(preds, axis=1)
        return NMS.non_max_suppression(
            merged, self.conf_thres, self.iou_thres, nc=self.spec.nc,
            nkpt=self.spec.nkpt, max_candidates=self.max_candidates,
            max_det=self.max_det)
