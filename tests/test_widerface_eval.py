"""WIDER FACE evaluation harness: exact-AP regression against the pinned
reference numbers (REFERENCE_AP.json, verified bit-identical to the
reference evaluation.py run over the committed fixture)."""

import json
import os

import numpy as np
import pytest

from face_detection_multi_scale_tpu.eval import widerface as WF

FIXTURE = "/root/reference/widerface_evaluate/widerface_txt"
GT = "/root/reference/widerface_evaluate/ground_truth"
PINNED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "REFERENCE_AP.json")

needs_fixture = pytest.mark.skipif(
    not (os.path.isdir(FIXTURE) and os.path.isdir(GT)),
    reason="reference fixture absent")


@needs_fixture
def test_full_protocol_matches_pinned_ap():
    with open(PINNED) as f:
        pinned = json.load(f)
    aps = WF.evaluation(FIXTURE, GT, verbose=False)
    for setting in ("easy", "medium", "hard"):
        assert abs(aps[setting] - pinned[setting]) < 1e-12, setting


def test_bbox_overlaps_plus1_convention():
    # identical boxes -> IoU 1; +1 convention: 10x10 box given as w=h=9
    b = np.array([[0, 0, 9, 9]], float)
    assert WF.bbox_overlaps_plus1(b, b)[0, 0] == 1.0
    # disjoint -> 0
    q = np.array([[20, 20, 29, 29]], float)
    assert WF.bbox_overlaps_plus1(b, q)[0, 0] == 0.0
    # adjacent boxes sharing an edge overlap by 1px column under +1
    q2 = np.array([[9, 0, 18, 9]], float)
    iou = WF.bbox_overlaps_plus1(b, q2)[0, 0]
    assert 0 < iou < 0.1


def test_write_and_read_roundtrip(tmp_path):
    rows = np.array([
        [10.4, 20.6, 110.2, 220.9, 0.987654],
        [0.0, 0.0, 5.0, 5.0, 1.5],  # conf > 1 clamps to 1
    ])
    path = str(tmp_path / "0--Event" / "img.txt")
    WF.write_pred_file(path, "img", rows)
    name, boxes = WF.read_pred_file(path)
    assert name == "img"
    assert boxes.shape == (2, 5)
    # int(x + 0.5) rounding of the reference writer
    np.testing.assert_array_equal(boxes[0, :4], [10, 21, 100, 200])
    assert boxes[0, 4] == pytest.approx(0.988)
    assert boxes[1, 4] == 1.0


@pytest.mark.parametrize("sorted_scores", [True, False])
def test_img_pr_info_matches_loop(sorted_scores):
    """Vectorized PR accumulation == the reference per-threshold loop,
    for both NMS-sorted and arbitrary file-order scores."""
    rng = np.random.default_rng(5)
    n = 57
    scores = rng.uniform(0, 1, n)
    if sorted_scores:
        scores = np.sort(scores)[::-1]
    proposal = rng.choice([1, -1], n, p=[0.8, 0.2])
    recall = np.cumsum(rng.choice([0, 1], n, p=[0.6, 0.4]))

    got = WF.img_pr_info(scores, proposal, recall)

    want = np.zeros((WF.THRESH_NUM, 2))
    for t in range(WF.THRESH_NUM):
        thresh = 1 - (t + 1) / WF.THRESH_NUM
        r_index = np.where(scores >= thresh)[0]
        if len(r_index):
            r = r_index[-1]
            want[t, 0] = len(np.where(proposal[:r + 1] == 1)[0])
            want[t, 1] = recall[r]
    np.testing.assert_array_equal(got, want)
