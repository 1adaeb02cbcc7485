"""Detection heads (Detect / IDetect / IKeypoint) and the grid decode.

The head convs emit raw per-level maps; `decode_level`/`decode` apply the
sigmoid + grid/anchor transform that the reference performs inside the
head's forward (reference models/yolo.py:278-306 for IKeypoint):

    xy  = (sigmoid(t_xy) * 2 - 0.5 + grid) * stride
    wh  = (sigmoid(t_wh) * 2) ** 2 * anchor_px
    obj/cls = sigmoid(t)
    kpt_xy  = (t_kpt_xy * 2 - 0.5 + grid) * stride     (no sigmoid)
    kpt_conf = sigmoid(t_kpt_conf)

Channel layout contract (reference models/yolo.py:70,273-274): per level the
det conv (na*no_det ch) and kpt conv (na*no_kpt ch) outputs are concatenated
then viewed as (bs, na, no, ny, nx) — the view deliberately re-slices the
concatenated channels anchor-major; we reproduce it exactly so converted
checkpoints decode identically.

Keeping the decode as pure jnp lets XLA fuse it into the tail of the conv
graph; the candidate selection (top-k by objectness) happens downstream in
ops/nms.py so the whole postprocess stays on device.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models.layers import (
    ConvBN, DWConvBN, ImplicitA, ImplicitM)
from face_detection_multi_scale_tpu.models.spec import ModelSpec


class DetectionHead(nn.Module):
    """IKeypoint / IDetect / Detect head producing raw per-level maps.

    ``variant`` selects the implicit-knowledge wrapping: "detect" = plain
    convs (models/yolo.py:25-111), "idetect"/"ikeypoint" = ia/im wrapped
    (models/yolo.py:114-212, 215-313).
    """
    spec: ModelSpec
    variant: str = "ikeypoint"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        s = self.spec
        na, no_det, no_kpt = s.na, s.no_det, s.no_kpt
        implicit = self.variant in ("idetect", "ikeypoint")
        outs = []
        for i, x in enumerate(xs):
            ch = x.shape[-1]
            xa = ImplicitA(ch, name=f"ia_{i}")(x) if implicit else x

            def det_bias_init(key, shape, dtype=jnp.float32, lvl=i):
                # focal-style prior biases (models/yolo.py:419-427):
                # obj ~ 8 objects per 640px image at this stride; cls
                # uniform 0.6/(nc-0.99)
                b = jnp.zeros((na, no_det), dtype)
                stride = float(s.strides[lvl])
                b = b.at[:, 4].set(math.log(8 / (640 / stride) ** 2))
                b = b.at[:, 5:].set(math.log(0.6 / (s.nc - 0.99)))
                return b.reshape(shape)

            det = nn.Conv(no_det * na, (1, 1), use_bias=True,
                          bias_init=det_bias_init,
                          dtype=self.dtype, name=f"m_{i}")(xa)
            if implicit:
                det = ImplicitM(no_det * na, name=f"im_{i}")(det)
            if s.nkpt:
                if s.dw_conv_kpt:
                    # 6x (DWConv3x3 + Conv1x1) tower + final raw conv
                    # (reference models/yolo.py:240-247)
                    k = x
                    for j in range(5):
                        k = DWConvBN(ch, ch, 3, dtype=self.dtype,
                                     name=f"m_kpt_{i}_{2 * j}")(k, train)
                        k = ConvBN(ch, 1, 1, dtype=self.dtype,
                                   name=f"m_kpt_{i}_{2 * j + 1}")(k, train)
                    k = DWConvBN(ch, ch, 3, dtype=self.dtype,
                                 name=f"m_kpt_{i}_10")(k, train)
                    kpt = nn.Conv(no_kpt * na, (1, 1), use_bias=True,
                                  dtype=self.dtype, name=f"m_kpt_{i}_11")(k)
                else:
                    kpt = nn.Conv(no_kpt * na, (1, 1), use_bias=True,
                                  dtype=self.dtype, name=f"m_kpt_{i}")(x)
                out = jnp.concatenate([det, kpt], axis=-1)
            else:
                out = det
            outs.append(out)
        return outs


def reshape_level(raw: jnp.ndarray, na: int, no: int) -> jnp.ndarray:
    """(bs, ny, nx, na*no) channel map -> (bs, na, ny, nx, no), replicating
    the reference view(bs, na, no, ny, nx).permute(0, 1, 3, 4, 2)
    (models/yolo.py:273-274): channel c maps to (a, o) = divmod(c, no)."""
    bs, ny, nx, _ = raw.shape
    x = raw.reshape(bs, ny, nx, na, no)
    return x.transpose(0, 3, 1, 2, 4)


def decode_level(raw: jnp.ndarray, anchors_px: jnp.ndarray, stride: int,
                 nkpt: int, nc: int) -> jnp.ndarray:
    """Decode one level's raw map (bs, na, ny, nx, no) to prediction rows
    (bs, na*ny*nx, no) in input-pixel space."""
    bs, na, ny, nx, no = raw.shape
    gy = jnp.arange(ny, dtype=raw.dtype)
    gx = jnp.arange(nx, dtype=raw.dtype)
    grid_x = jnp.broadcast_to(gx[None, :], (ny, nx))
    grid_y = jnp.broadcast_to(gy[:, None], (ny, nx))
    grid = jnp.stack([grid_x, grid_y], axis=-1)  # (ny, nx, 2) as (x, y)

    det = nn.sigmoid(raw[..., :5 + nc])
    xy = (det[..., 0:2] * 2.0 - 0.5 + grid) * stride
    anchor = anchors_px.reshape(1, na, 1, 1, 2).astype(raw.dtype)
    wh = (det[..., 2:4] * 2.0) ** 2 * anchor
    parts = [xy, wh, det[..., 4:]]
    if nkpt:
        kraw = raw[..., 5 + nc:].reshape(bs, na, ny, nx, nkpt, 3)
        kxy = (kraw[..., 0:2] * 2.0 - 0.5 + grid[:, :, None, :]) * stride
        kconf = nn.sigmoid(kraw[..., 2:3])
        kpts = jnp.concatenate([kxy, kconf], axis=-1).reshape(
            bs, na, ny, nx, nkpt * 3)
        parts.append(kpts)
    y = jnp.concatenate(parts, axis=-1)
    return y.reshape(bs, na * ny * nx, no)


def decode(raw_levels: Sequence[jnp.ndarray], spec: ModelSpec) -> jnp.ndarray:
    """Decode all levels and concatenate: (bs, sum(na*ny*nx), no).

    Row order matches the reference torch.cat(z, 1) over levels with
    anchor-major flattening within each level (models/yolo.py:306-308)."""
    zs = []
    for lvl, raw in enumerate(raw_levels):
        anchors = jnp.asarray(spec.anchors[lvl], jnp.float32).reshape(-1, 2)
        zs.append(decode_level(raw, anchors, spec.strides[lvl],
                               spec.nkpt, spec.nc))
    return jnp.concatenate(zs, axis=1)
