"""Merge-NMS refinement vs the reference weighted-mean formula
(utils/general.py:587-593)."""

import numpy as np

import jax.numpy as jnp

from face_detection_multi_scale_tpu.ops import nms as N


def test_merge_nms_weighted_mean():
    boxes = np.array([
        [10, 10, 50, 50],
        [12, 12, 52, 52],   # overlaps box 0
        [200, 200, 240, 240],
    ], np.float32)
    conf = np.array([0.9, 0.6, 0.8], np.float32)

    dets = N.non_max_suppression(
        np.concatenate([  # build decoded rows (cx, cy, w, h, obj, cls)
            (boxes[:, :2] + boxes[:, 2:]) / 2,
            boxes[:, 2:] - boxes[:, :2],
            np.ones((3, 1)), conf[:, None] / 1.0], axis=1)[None],
        0.1, 0.5, nc=1, nkpt=0, max_candidates=3, max_det=3,
        backend="xla")
    kept = np.asarray(dets.valid)[0]
    assert kept.sum() == 2  # box 1 suppressed by box 0

    merged = N.merge_nms_boxes(dets, jnp.asarray(boxes)[None],
                               jnp.asarray(conf)[None], 0.5)
    mb = np.asarray(merged.boxes)[0]
    # the kept high-conf box becomes the conf-weighted mean of boxes 0+1
    w = conf[:2]
    expect = (boxes[0] * w[0] + boxes[1] * w[1]) / w.sum()
    got_first = mb[0]
    np.testing.assert_allclose(got_first, expect, atol=1e-3)
    # the isolated box is unchanged
    np.testing.assert_allclose(mb[1], boxes[2], atol=1e-3)
