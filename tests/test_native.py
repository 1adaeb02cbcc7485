"""Native C++ kernels vs the Python/JAX implementations: the C++ side is
the CPU parity oracle for decode + NMS + IoU (the role the ncnn app and
Cython kernel play in the reference)."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu import native as N
from face_detection_multi_scale_tpu.eval.widerface import (
    bbox_overlaps_plus1 as np_overlaps)

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native toolchain unavailable")


def test_bbox_overlaps_native_vs_numpy():
    rng = np.random.default_rng(0)
    b = rng.uniform(0, 500, (40, 2))
    boxes = np.concatenate([b, b + rng.uniform(5, 100, (40, 2))], 1)
    q = rng.uniform(0, 500, (23, 2))
    query = np.concatenate([q, q + rng.uniform(5, 100, (23, 2))], 1)
    np.testing.assert_allclose(N.bbox_overlaps_plus1(boxes, query),
                               np_overlaps(boxes, query), rtol=1e-12)


def test_native_nms_vs_jax_matrix():
    from face_detection_multi_scale_tpu.ops.nms import nms_keep_matrix

    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 600, (300, 2)).astype(np.float32)
    wh = rng.uniform(5, 120, (300, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    scores = rng.uniform(0, 1, 300).astype(np.float32)
    want_idx, want_valid = nms_keep_matrix(boxes, scores, 0.5, 300)
    want = np.asarray(want_idx)[np.asarray(want_valid)]
    got = N.greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(got, want)


def test_native_decode_vs_jax():
    from face_detection_multi_scale_tpu.models.head import decode_level

    rng = np.random.default_rng(2)
    na, ny, nx, nc, nkpt = 3, 8, 10, 1, 5
    no = 5 + nc + 3 * nkpt
    raw = rng.normal(size=(1, na, ny, nx, no)).astype(np.float32)
    anchors = np.array([[4, 5], [6, 8], [10, 12]], np.float32)
    want = np.asarray(decode_level(raw, anchors, 8, nkpt, nc))[0]
    got = N.decode_level(raw[0], anchors, 8.0, nc, nkpt)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_native_scale_coords_inverse():
    from face_detection_multi_scale_tpu.data.letterbox import scale_coords

    rng = np.random.default_rng(3)
    coords = rng.uniform(0, 640, (3, 4))  # <= 4 rows: reference clips all
    want = scale_coords((640, 640), coords.copy(), (480, 710))
    got = N.scale_coords_inverse(coords.copy(), (640, 640), (480, 710))
    np.testing.assert_allclose(got, want, rtol=1e-12)
