"""Fused ON-DEVICE preprocessing for the throughput path.

The host-side cv2 pipeline (data/letterbox.py) is the parity oracle and
the default: it reproduces the reference bit-for-bit
(utils/datasets.py:873-903 letterbox,
utils/preprocess_yolo_predict.py:273-378 pad-to-square + API chain). This
module is the TPU-native alternative for serving: the raw uint8 frame is
transferred once, and resize + pad + BGR->RGB + /255 run on device, fused
by XLA into the same executable as the network.

Why this wins (SURVEY.md §7 step 10):
  * one H2D of the RAW frame feeds EVERY pyramid scale — the host path
    uploads each letterboxed scale separately (a 3840² letterboxed input
    is ~44 MB; a raw 1080p frame is ~6 MB);
  * the host sheds all cv2 resize work (it is the CPU bottleneck of the
    production pipeline, yolov7_face_multi_scale_dataframe_predict.py);
  * resize runs at HBM bandwidth on device and fuses with the /255
    normalize and the first conv's layout transform.

Numerics: jax.image.resize(method="linear") uses the same half-pixel
source mapping as cv2.INTER_LINEAR but computes in float, while cv2 uses
fixed-point with rounding — outputs differ by up to ~2/255 per pixel
(documented tolerance, asserted in tests/test_device_preprocess.py).
Detection parity at realistic operating points is unaffected; for
bit-exact fixture regeneration use the host path.

All shapes are static per (src_hw, out_size) pair: one compiled
executable per combination, matching the framework's fixed-shape design
rule. Geometry (scale/pad arithmetic) is computed host-side in Python at
trace time with EXACTLY the reference letterbox rounding, so
`scale_coords`/`scale_coords_api` invert device-preprocessed detections
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from face_detection_multi_scale_tpu.utils.general import make_divisible

PAD_VALUE = 114.0


@dataclasses.dataclass(frozen=True)
class LetterboxGeometry:
    """Static letterbox geometry for one (src, dst) shape pair.

    Mirrors the reference letterbox arithmetic (utils/datasets.py:873-903):
    ratio = min(dst/src) (capped at 1 unless scaleup), new_unpad =
    round(src * ratio), padding split in half with the round(+/-0.1)
    convention. `out_hw` is the final network input shape.
    """
    src_hw: Tuple[int, int]
    out_hw: Tuple[int, int]
    new_unpad: Tuple[int, int]          # (w, h) like the reference
    pad_tblr: Tuple[int, int, int, int]  # top, bottom, left, right
    ratio: float


def letterbox_geometry(src_hw: Tuple[int, int], new_shape,
                       auto: bool = False, scaleup: bool = True,
                       stride: int = 32) -> LetterboxGeometry:
    """Compute the exact reference letterbox geometry on the host."""
    shape = tuple(int(v) for v in src_hw)
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out_hw = (new_unpad[1] + top + bottom, new_unpad[0] + left + right)
    return LetterboxGeometry(src_hw=shape, out_hw=out_hw,
                             new_unpad=new_unpad,
                             pad_tblr=(top, bottom, left, right), ratio=r)


def device_letterbox(images_u8: jnp.ndarray, geom: LetterboxGeometry,
                     *, bgr_to_rgb: bool = True,
                     dtype=jnp.float32) -> jnp.ndarray:
    """uint8 NHWC raw frames -> normalized letterboxed network input.

    Jit-friendly (static shapes from `geom`); fuses channel swap, bilinear
    resize, 114-gray pad, and /255 into whatever executable calls it.
    """
    x = images_u8
    if bgr_to_rgb:
        x = x[..., ::-1]
    x = x.astype(dtype)
    n = x.shape[0]
    uw, uh = geom.new_unpad
    if (uh, uw) != geom.src_hw:
        # antialias=False matches cv2.INTER_LINEAR's plain 2x2 bilinear
        # sampling (cv2 never antialiases); with it on, >2x downscales
        # diverge systematically from the reference letterbox
        x = jax.image.resize(x, (n, uh, uw, 3), method="linear",
                             antialias=False)
    top, bottom, left, right = geom.pad_tblr
    if any((top, bottom, left, right)):
        x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                    constant_values=PAD_VALUE)
    return x / 255.0


def device_preprocess_api(images_u8: jnp.ndarray, img_size: int,
                          *, dtype=jnp.float32) -> jnp.ndarray:
    """Device version of the production API chain
    (utils/preprocess_yolo_predict.py:273-378): zero-pad right/bottom to a
    square, then resize to (img_size, img_size). Input is RGB already (the
    API chain never swaps channels); pass RGB uint8 NHWC."""
    n, h, w, _ = images_u8.shape
    side = max(h, w)
    x = images_u8.astype(dtype)
    if (h, w) != (side, side):
        x = jnp.pad(x, ((0, 0), (0, side - h), (0, side - w), (0, 0)))
    if side != img_size:
        x = jax.image.resize(x, (n, img_size, img_size, 3),
                             method="linear", antialias=False)
    return x / 255.0


def geometry_for_api(src_hw: Tuple[int, int],
                     img_size: int) -> LetterboxGeometry:
    """Geometry record for the API chain (pure top-left scale, no pad in
    the output frame) so `scale_coords_api` inverts it directly."""
    side = max(src_hw)
    return LetterboxGeometry(
        src_hw=tuple(int(v) for v in src_hw),
        out_hw=(img_size, img_size),
        new_unpad=(img_size, img_size),
        pad_tblr=(0, 0, 0, 0),
        ratio=img_size / side)


def check_img_size_geometry(src_hw, img_size: int, stride: int,
                            auto: bool) -> LetterboxGeometry:
    """Letterbox geometry with the CLI's stride rounding applied to
    img_size first (check_img_size, utils/general.py:130-135)."""
    size = make_divisible(img_size, stride)
    return letterbox_geometry(src_hw, size, auto=auto, stride=stride)
