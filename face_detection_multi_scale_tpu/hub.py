"""Programmatic entry points (the torch.hub surface equivalent).

Reference parity: hubconf.py:21-87 `create`/`custom` — load a model
family member by name with optional pretrained weights and get an
input-robust detector back.
"""

from __future__ import annotations

from typing import Optional, Sequence

from face_detection_multi_scale_tpu.models import zoo


def available_models():
    return zoo.available()


def create(name: str = "yolov7-w6-face", weights: Optional[str] = None,
           img_sizes: Sequence[int] = (640,), conf_thres: float = 0.25,
           iou_thres: float = 0.45, **kw):
    """Build a ready-to-run FaceDetector for a zoo model. `weights` is a
    reference torch .pt checkpoint (converted on the fly) or a framework
    inference .npz."""
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    return FaceDetector(name, torch_weights=weights, img_sizes=img_sizes,
                        conf_thres=conf_thres, iou_thres=iou_thres, **kw)


def custom(cfg_path: str, weights: Optional[str] = None, **kw):
    """Build a detector from a reference-format cfg yaml (the hubconf
    `custom` equivalent)."""
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector
    from face_detection_multi_scale_tpu.models.spec import load_spec

    return FaceDetector(load_spec(cfg_path), torch_weights=weights, **kw)
