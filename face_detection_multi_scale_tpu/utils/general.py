"""Small shape/size utilities shared across the framework.

Behavioral parity notes reference utils/general.py in the upstream repo
(/root/reference): `make_divisible` (general.py:210), `check_img_size`
(general.py:130-135).
"""

from __future__ import annotations

import math


def make_divisible(x: float, divisor: int) -> int:
    """Round ``x`` up to the nearest multiple of ``divisor``."""
    return int(math.ceil(x / divisor) * divisor)


def check_img_size(img_size: int, s: int = 32) -> int:
    """Round ``img_size`` to the nearest stride multiple (reference
    utils/general.py:130-135 semantics: ceil to multiple of ``s``)."""
    new_size = make_divisible(img_size, int(s))
    return new_size


def labels_to_class_weights(labels, nc: int = 1):
    """Inverse-frequency class weights from training labels
    (reference utils/general.py:250-266): per-class occurrence counts
    with empty bins as 1, inverted and normalized to sum 1."""
    import numpy as np

    rows = [l for l in labels if l is not None and len(l)]
    if not rows:
        return np.ones(nc) / nc
    classes = np.concatenate(rows, 0)[:, 0].astype(int)
    weights = np.bincount(classes, minlength=nc).astype(np.float64)
    weights[weights == 0] = 1
    weights = 1 / weights
    return weights / weights.sum()


def labels_to_image_weights(labels, nc: int = 1, class_weights=None):
    """Per-image sampling weights from class weights and image contents
    (reference utils/general.py:269-274)."""
    import numpy as np

    if class_weights is None:
        class_weights = np.ones(nc)
    counts = np.array([
        np.bincount(l[:, 0].astype(int), minlength=nc)
        if l is not None and len(l) else np.zeros(nc, int)
        for l in labels])
    return (np.asarray(class_weights).reshape(1, nc) * counts).sum(1)
