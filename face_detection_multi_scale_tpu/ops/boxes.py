"""Box geometry: coordinate conversions and the IoU family, as pure jnp ops.

All functions are shape-polymorphic over leading batch dims and jit-safe
(no data-dependent shapes). Behavioral parity targets in the reference repo:
`xywh2xyxy`/`xyxy2xywh` (utils/general.py:289-307), `box_iou`
(utils/general.py:473-495), `bbox_iou` with GIoU/DIoU/CIoU/EIoU/SIoU
(utils/general.py:407-471), `wh_iou` (utils/general.py:498-503).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-xywh -> corner-xyxy."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner-xyxy -> center-xywh."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x: jnp.ndarray, w: float = 640, h: float = 640,
               padw: float = 0, padh: float = 0) -> jnp.ndarray:
    """Normalized center-xywh -> pixel corner-xyxy with padding offset."""
    cx, cy, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([
        w * (cx - bw / 2) + padw,
        h * (cy - bh / 2) + padh,
        w * (cx + bw / 2) + padw,
        h * (cy + bh / 2) + padh,
    ], axis=-1)


def box_area(box: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (N, 4) x (M, 4) xyxy boxes -> (N, M)."""
    area1 = box_area(box1)  # (N,)
    area2 = box_area(box2)  # (M,)
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])  # (N, M, 2)
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])  # (N, M, 2)
    inter = jnp.clip(rb - lt, 0, None).prod(-1)  # (N, M)
    return inter / (area1[:, None] + area2[None, :] - inter)


def wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """IoU of (N, 2) x (M, 2) width-height pairs, as if corner-anchored."""
    inter = jnp.minimum(wh1[:, None, :], wh2[None, :, :]).prod(-1)
    return inter / (wh1.prod(-1)[:, None] + wh2.prod(-1)[None, :] - inter)


def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, *, xywh: bool = False,
             kind: str = "iou", eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU between broadcast-matched boxes with optional
    GIoU / DIoU / CIoU / EIoU / SIoU penalty terms.

    ``kind`` in {"iou", "giou", "diou", "ciou", "eiou", "siou"}. EIoU is the
    box-loss criterion used for training (reference utils/loss.py:162).
    Inputs broadcast elementwise over leading dims; last dim is 4.
    """
    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2
    b1_x1, b1_y1, b1_x2, b1_y2 = b1[..., 0], b1[..., 1], b1[..., 2], b1[..., 3]
    b2_x1, b2_y1, b2_x2, b2_y2 = b2[..., 0], b2[..., 1], b2[..., 2], b2[..., 3]

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None))

    # union; note the reference adds eps to heights only (utils/general.py:434-436)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if kind == "iou":
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)  # convex width
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)  # convex height
    if kind == "giou":
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    c2 = cw ** 2 + ch ** 2 + eps  # convex diagonal squared
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
            + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4  # center distance sq
    if kind == "diou":
        return iou - rho2 / c2
    if kind == "ciou":
        v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    if kind == "eiou":
        w_dis = (b1_x2 - b1_x1 - b2_x2 + b2_x1) ** 2
        h_dis = (b1_y2 - b1_y1 - b2_y2 + b2_y1) ** 2
        return iou - (rho2 / c2 + w_dis / (cw ** 2 + eps) + h_dis / (ch ** 2 + eps))
    if kind == "siou":
        s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5
        s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5
        sigma = jnp.sqrt(s_cw ** 2 + s_ch ** 2)
        sin_a1 = jnp.abs(s_cw) / sigma
        sin_a2 = jnp.abs(s_ch) / sigma
        threshold = math.sqrt(2) / 2
        sin_alpha = jnp.where(sin_a1 > threshold, sin_a2, sin_a1)
        angle_cost = jnp.cos(jnp.arcsin(sin_alpha) * 2 - math.pi / 2)
        rho_x = (s_cw / cw) ** 2
        rho_y = (s_ch / ch) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
        return iou - 0.5 * (distance_cost + shape_cost)
    raise ValueError(f"unknown IoU kind: {kind!r}")
