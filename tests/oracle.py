"""Import the upstream PyTorch reference (read-only at /root/reference) as a
behavioral oracle for parity tests.

The reference imports `torchvision` only for `torchvision.ops.nms`, which is
absent from this environment, so we install a minimal pure-torch shim before
importing any reference module. The reference code is never copied — it is
executed as a black box to produce golden outputs.
"""

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _torch_nms(boxes, scores, iou_threshold):
    """Pure-torch NMS with torchvision.ops.nms semantics: sort by score
    descending (stable), suppress boxes with IoU strictly greater than the
    threshold against an already-kept box, return kept indices."""
    import torch

    order = torch.argsort(scores, descending=True, stable=True)
    boxes = boxes[order]
    n = boxes.shape[0]
    keep_mask = torch.ones(n, dtype=torch.bool)
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    for i in range(n):
        if not keep_mask[i]:
            continue
        xx1 = torch.maximum(x1[i], x1[i + 1:])
        yy1 = torch.maximum(y1[i], y1[i + 1:])
        xx2 = torch.minimum(x2[i], x2[i + 1:])
        yy2 = torch.minimum(y2[i], y2[i + 1:])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[i + 1:] - inter)
        keep_mask[i + 1:] &= iou <= iou_threshold
    return order[keep_mask[: n]]


def install_torchvision_shim():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0-shim"
    ops = types.ModuleType("torchvision.ops")
    ops.nms = _torch_nms
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def import_reference():
    """Add /root/reference to sys.path (after the shim) and return a module
    namespace accessor. Reference modules are imported lazily by name.
    Skips the calling test module when the reference isn't mounted, so the
    suite still runs standalone."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        import pytest

        pytest.skip("reference repo not mounted at /root/reference",
                    allow_module_level=True)
    install_torchvision_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    class Ref:
        def __call__(self, dotted_name):
            return importlib.import_module(dotted_name)

        def __getattr__(self, name):
            return importlib.import_module(name)

    return Ref()


def torch_to_numpy(x):
    return x.detach().cpu().numpy()


def seeded_torch(seed=0):
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    return torch
