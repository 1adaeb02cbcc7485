"""Parity tests: box geometry and IoU family vs the PyTorch reference."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.ops import boxes as B

from oracle import import_reference, seeded_torch, torch_to_numpy

ref = import_reference()


def random_boxes_xyxy(n, seed=0, size=640):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 4, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_xywh2xyxy_roundtrip():
    general = ref("utils.general")
    torch = seeded_torch()
    x = torch.rand(32, 4) * 640
    got = np.asarray(B.xywh2xyxy(x.numpy()))
    want = torch_to_numpy(general.xywh2xyxy(x))
    np.testing.assert_allclose(got, want, atol=1e-5)
    back = np.asarray(B.xyxy2xywh(got))
    np.testing.assert_allclose(back, x.numpy(), atol=1e-4)


def test_box_iou_matrix():
    general = ref("utils.general")
    torch = seeded_torch(1)
    b1 = torch.from_numpy(random_boxes_xyxy(17, seed=1))
    b2 = torch.from_numpy(random_boxes_xyxy(23, seed=2))
    want = torch_to_numpy(general.box_iou(b1, b2))
    got = np.asarray(B.box_iou(b1.numpy(), b2.numpy()))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind,kwargs", [
    ("iou", {}),
    ("giou", {"GIoU": True}),
    ("diou", {"DIoU": True}),
    ("ciou", {"CIoU": True}),
    ("eiou", {"EIoU": True}),
    ("siou", {"SIoU": True}),
])
def test_bbox_iou_variants(kind, kwargs):
    general = ref("utils.general")
    torch = seeded_torch(2)
    # reference bbox_iou signature: box1 is (4,), box2 is (n, 4) transposed inside
    b1 = torch.from_numpy(random_boxes_xyxy(1, seed=3)[0])
    b2 = torch.from_numpy(random_boxes_xyxy(64, seed=4))
    want = torch_to_numpy(general.bbox_iou(b1, b2, x1y1x2y2=True, **kwargs))
    got = np.asarray(B.bbox_iou(b1.numpy()[None, :], b2.numpy(), kind=kind))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bbox_iou_xywh_mode():
    general = ref("utils.general")
    torch = seeded_torch(5)
    b1 = torch.rand(4) * 100 + 1
    b2 = torch.rand(16, 4) * 100 + 1
    want = torch_to_numpy(general.bbox_iou(b1, b2, x1y1x2y2=False, EIoU=True))
    got = np.asarray(B.bbox_iou(b1.numpy()[None, :], b2.numpy(), xywh=True, kind="eiou"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_wh_iou():
    general = ref("utils.general")
    torch = seeded_torch(6)
    wh1 = torch.rand(5, 2) * 100 + 1
    wh2 = torch.rand(9, 2) * 100 + 1
    want = torch_to_numpy(general.wh_iou(wh1, wh2))
    got = np.asarray(B.wh_iou(wh1.numpy(), wh2.numpy()))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
