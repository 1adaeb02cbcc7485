"""Augmented inference: multi-scale + flip test-time augmentation.

Reference semantics:
  * forward_augment (models/yolo.py:363-417): scales [1, 0.83, 0.67] with
    flips [none, lr, none]; each input is bilinear-resized (scale_img,
    utils/torch_utils.py:247-257: pad to stride multiple with 0.447),
    decoded, then de-scaled (boxes /= scale; lr flip: x = W - x) and all
    candidate sets concatenated. Landmark columns are NOT de-scaled —
    matching the reference, which only adjusts columns :4 and x.
  * flip_test (test.py:145-151): a second forward on the lr-flipped
    image, fused as (out + out_flip) / 2 and concatenated.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models.head import decode

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, "lr", None)
PAD_VALUE = 0.447  # imagenet mean gray (utils/torch_utils.py:257)


def scale_img(x: jnp.ndarray, ratio: float, gs: int = 32) -> jnp.ndarray:
    """Bilinear scale of an NHWC batch constrained to gs-multiple canvas
    (utils/torch_utils.py:247-257)."""
    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    sh, sw = int(h * ratio), int(w * ratio)
    resized = jax.image.resize(x, (b, sh, sw, c), method="bilinear")
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return jnp.pad(resized, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)),
                   constant_values=PAD_VALUE)


def descale_pred(p: jnp.ndarray, flip, scale: float,
                 img_hw: Tuple[int, int]) -> jnp.ndarray:
    """Invert the TTA transform on decoded predictions
    (models/yolo.py:402-417)."""
    boxes = p[..., :4] / scale
    if flip == "ud":
        boxes = boxes.at[..., 1].set(img_hw[0] - boxes[..., 1])
    elif flip == "lr":
        boxes = boxes.at[..., 0].set(img_hw[1] - boxes[..., 0])
    return jnp.concatenate([boxes, p[..., 4:]], axis=-1)


def forward_augment(model, variables, x: jnp.ndarray,
                    scales: Sequence[float] = TTA_SCALES,
                    flips: Sequence = TTA_FLIPS) -> jnp.ndarray:
    """Scale/flip TTA forward: decoded predictions concatenated over the
    augmentations (models/yolo.py:363-374)."""
    spec = model.spec
    img_hw = (x.shape[1], x.shape[2])
    outs = []
    for si, fi in zip(scales, flips):
        xi = x
        if fi == "lr":
            xi = xi[:, :, ::-1, :]
        elif fi == "ud":
            xi = xi[:, ::-1, :, :]
        xi = scale_img(xi, si, gs=spec.max_stride)
        raws = model.apply(variables, xi, train=False)
        yi = decode(raws, spec)
        outs.append(descale_pred(yi, fi, si, img_hw))
    return jnp.concatenate(outs, axis=1)


def forward_flip_test(model, variables, x: jnp.ndarray) -> jnp.ndarray:
    """The test.py flip-test fusion: average of the plain and the
    lr-flipped forward (in the flipped frame, as the reference does),
    concatenated to the plain candidates (test.py:145-151)."""
    raws = model.apply(variables, x, train=False)
    out = decode(raws, model.spec)
    raws_f = model.apply(variables, x[:, :, ::-1, :], train=False)
    out_f = decode(raws_f, model.spec)
    fuse = (out + out_f) / 2.0
    return jnp.concatenate([out, fuse], axis=1)
