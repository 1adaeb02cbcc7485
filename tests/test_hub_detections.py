"""The torch.hub user surface: autoShape-equivalent `predict` (input
robustness + one common stride-aligned inference rectangle, reference
models/common.py:572-639) and the `Detections` results object
(models/common.py:642-726), oracled against the reference class."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.infer.results import Detections

from oracle import import_reference

ref = import_reference()


def _synthetic(seed, n_img=2):
    rng = np.random.default_rng(seed)
    imgs, preds = [], []
    for _ in range(n_img):
        h, w = int(rng.integers(100, 300)), int(rng.integers(100, 300))
        imgs.append(rng.integers(0, 255, (h, w, 3), np.uint8))
        n = int(rng.integers(1, 5))
        x1 = rng.uniform(0, w * 0.6, n)
        y1 = rng.uniform(0, h * 0.6, n)
        preds.append(np.stack([
            x1, y1, x1 + rng.uniform(5, w * 0.4, n),
            y1 + rng.uniform(5, h * 0.4, n),
            rng.uniform(0.2, 1.0, n), np.zeros(n)], axis=1))
    return imgs, preds


def test_detections_views_match_reference():
    """xyxy/xywh/normalized views and pandas column names are identical
    to the reference Detections built from the same rows."""
    import torch

    imgs, preds = _synthetic(0)
    ours = Detections(imgs, preds, ["a.jpg", "b.jpg"], names=["face"])
    theirs = ref("models.common").Detections(
        [im.copy() for im in imgs],
        [torch.from_numpy(p.copy()) for p in preds],
        ["a.jpg", "b.jpg"], times=[0, 1, 2, 3], names=["face"],
        shape=(2, 3, 128, 128))

    for k in ("xyxy", "xywh", "xyxyn", "xywhn"):
        for g, w in zip(getattr(ours, k), getattr(theirs, k)):
            np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                       atol=1e-6, err_msg=k)

    gp, wp = ours.pandas(), theirs.pandas()
    for k in ("xyxy", "xywhn"):
        for g, w in zip(getattr(gp, k), getattr(wp, k)):
            assert list(g.columns) == list(w.columns)
            np.testing.assert_allclose(
                g.drop(columns="name").to_numpy(float),
                w.drop(columns="name").to_numpy(float), atol=1e-6)
            assert list(g["name"]) == list(w["name"])

    assert len(ours) == len(theirs) == 2
    ts = ours.tolist()
    assert len(ts) == 2 and ts[0].pred.shape == preds[0].shape


def test_detections_save_crop_render(tmp_path, capsys):
    imgs, preds = _synthetic(1)
    d = Detections(imgs, preds, ["x.jpg", "y.jpg"], names=["face"],
                   shape=(2, 128, 128, 3))
    out = d.save(save_dir=tmp_path / "sv")
    assert sorted(p.name for p in out.iterdir()) == ["x.jpg", "y.jpg"]
    cout = d.crop(save_dir=tmp_path / "cr")
    crops = list((cout / "crops" / "face").iterdir())
    assert len(crops) == sum(len(p) for p in preds)
    # channel correctness: a crop read back with cv2 (BGR) matches the
    # RGB source region flipped — not double-flipped
    import cv2

    x1, y1, x2, y2 = preds[-1][-1][:4]
    from face_detection_multi_scale_tpu.utils.general import (
        _xywh2xyxy_np, _xyxy2xywh_np)
    b = _xyxy2xywh_np(np.array([[x1, y1, x2, y2]]))
    b[:, 2:] = b[:, 2:] * 1.02 + 10
    bb = _xywh2xyxy_np(b).astype(int)[0]
    h, w = imgs[-1].shape[:2]
    bb[[0, 2]] = bb[[0, 2]].clip(0, w)
    bb[[1, 3]] = bb[[1, 3]].clip(0, h)
    want_bgr = imgs[-1][bb[1]:bb[3], bb[0]:bb[2]][:, :, ::-1]
    got = cv2.imread(str(sorted(crops)[-1]))
    assert got.shape == want_bgr.shape
    # jpeg-lossy: compare channel means
    assert np.abs(got.mean(axis=(0, 1)) - want_bgr.mean(axis=(0, 1))).max() < 3
    rendered = d.render()
    assert rendered[0].shape == imgs[0].shape
    d.print()
    printed = capsys.readouterr().out
    assert "image 1/2" in printed and "face" in printed


@pytest.fixture(scope="module")
def det():
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    return FaceDetector("yolov7-lite-t", img_sizes=(128,),
                        conf_thres=0.001, max_det=20, max_candidates=256)


def test_predict_input_robustness(det, tmp_path):
    """Filename, PIL, HWC numpy, CHW numpy, grayscale — one batched call,
    coords back in each original frame."""
    import cv2
    from PIL import Image

    rng = np.random.default_rng(2)
    bgr = rng.integers(0, 255, (160, 240, 3), np.uint8)
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, bgr)
    pil = Image.fromarray(rng.integers(0, 255, (120, 180, 3), np.uint8))
    hwc = rng.integers(0, 255, (200, 140, 3), np.uint8)
    chw = rng.integers(0, 255, (3, 96, 128), np.uint8)
    gray = rng.integers(0, 255, (100, 100), np.uint8)

    res = det.predict([path, pil, hwc, chw, gray], size=128)
    assert len(res) == 5
    assert res.files[0] == "img.jpg"
    # coordinates come back in each image's own original frame.
    # scale_coords clips only the first 4 ROWS (the reference-compat
    # quirk, utils/general.py:391, shared by the reference autoShape),
    # so assert clipping there and boundedness-to-frame-scale elsewhere
    for rows, im in zip(res.pred, res.imgs):
        h, w = im.shape[:2]
        if len(rows):
            head = rows[:4]
            assert (head[:, [0, 2]] <= w + 1e-6).all()
            assert (head[:, [1, 3]] <= h + 1e-6).all()
            assert np.isfinite(rows).all()
            assert (rows[:, :4] <= 2 * max(h, w)).all()
    # the callable alias
    res2 = det(hwc, size=128)
    assert len(res2) == 1


def test_predict_common_shape_formula(det):
    """The batch letterboxes to max(per-image scaled shapes) rounded up
    to the stride (models/common.py:615-619)."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (160, 240, 3), np.uint8)  # scaled (85, 128)
    b = rng.integers(0, 255, (240, 120, 3), np.uint8)  # scaled (128, 64)
    res = det.predict([a, b], size=128)
    # max -> (128, 128); stride 32 aligned -> (128, 128)
    assert tuple(res.s[1:3]) == (128, 128)
    c = rng.integers(0, 255, (100, 200, 3), np.uint8)  # scaled (64, 128)
    res = det.predict([c], size=128)
    assert tuple(res.s[1:3]) == (64, 128)  # rect, not square
