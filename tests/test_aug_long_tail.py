"""Seeded parity for the long-tail augmentation utilities: mosaic9,
cutout, replicate (same global-RNG draw order as the reference), and
behavioral checks + byte parity for autosplit / extract_boxes
(reference utils/datasets.py:780-852, 856-870, 1017-1061, 1078-1133).
All of these are unused by the default face recipe; they complete the
reference's component surface."""

import random
from pathlib import Path

import numpy as np
import pytest

from face_detection_multi_scale_tpu.data.dataset import (
    FaceDataset, autosplit, cutout, extract_boxes, replicate)
from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P5

from oracle import import_reference
from test_dataset import NKPT, make_fake_widerface

ref = import_reference()


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    return make_fake_widerface(tmp_path_factory.mktemp("wf_lt"),
                               n_images=9, seed=11)


def test_mosaic9_parity(fake_data):
    hyp = dict(HYP_SCRATCH_P5, mosaic=1.0)
    ours = FaceDataset(fake_data, img_size=192, augment=True, hyp=hyp,
                       kpt_label=NKPT)
    datasets = ref("utils.datasets")
    theirs = datasets.LoadImagesAndLabels(
        fake_data, img_size=192, batch_size=4, augment=True, hyp=hyp,
        rect=False, kpt_label=NKPT)
    for i in range(3):
        seed = 900 + i
        random.seed(seed)
        np.random.seed(seed)
        img_t, labels_t = datasets.load_mosaic9(theirs, i)
        random.seed(seed)
        np.random.seed(seed)
        img_o, labels_o = ours.load_mosaic9(i)
        np.testing.assert_array_equal(img_o, img_t)
        np.testing.assert_allclose(labels_o, labels_t, atol=1e-4)


def _px_labels(rng, n, h, w):
    x1 = rng.uniform(0, w * 0.7, n)
    y1 = rng.uniform(0, h * 0.7, n)
    return np.stack([np.zeros(n), x1, y1,
                     x1 + rng.uniform(5, w * 0.3, n),
                     y1 + rng.uniform(5, h * 0.3, n)], axis=1)


def test_cutout_parity():
    datasets = ref("utils.datasets")
    rng = np.random.default_rng(4)
    for seed in (1, 2, 3):
        img = rng.integers(0, 255, (160, 200, 3), np.uint8)
        labels = _px_labels(rng, 8, 160, 200).astype(np.float32)
        img_t, img_o = img.copy(), img.copy()
        random.seed(seed)
        want = datasets.cutout(img_t, labels.copy())
        random.seed(seed)
        got = cutout(img_o, labels.copy())
        np.testing.assert_array_equal(img_o, img_t)
        np.testing.assert_allclose(got, want)


def test_replicate_parity():
    datasets = ref("utils.datasets")
    rng = np.random.default_rng(5)
    for seed in (7, 8):
        img = rng.integers(0, 255, (160, 200, 3), np.uint8)
        labels = _px_labels(rng, 6, 160, 200).astype(np.float32)
        img_t, img_o = img.copy(), img.copy()
        random.seed(seed)
        want_img, want_l = datasets.replicate(img_t, labels.copy())
        random.seed(seed)
        got_img, got_l = replicate(img_o, labels.copy())
        np.testing.assert_array_equal(got_img, want_img)
        np.testing.assert_allclose(got_l, want_l)
        assert len(got_l) == len(labels) + round(len(labels) * 0.5)


def test_autosplit(fake_data):
    img_dir = Path(fake_data)
    random.seed(0)
    autosplit(img_dir, weights=(0.6, 0.3, 0.1))
    splits = {}
    for name in ("train", "val", "test"):
        p = img_dir / f"autosplit_{name}.txt"
        splits[name] = p.read_text().splitlines() if p.exists() else []
    all_files = [f for v in splits.values() for f in v]
    assert len(all_files) == 9 and len(set(all_files)) == 9
    # annotated_only keeps only images with a label file (all of them here)
    random.seed(0)
    autosplit(img_dir, weights=(1.0, 0.0, 0.0), annotated_only=True)
    assert len((img_dir / "autosplit_train.txt")
               .read_text().splitlines()) == 9


def _make_box_only_dataset(root, n_images=4, seed=13):
    """Plain [cls x y w h] labels: the reference extract_boxes broadcasts
    x[1:] * [w,h,w,h] (utils/datasets.py:1103) and so crashes on
    keypoint-bearing rows — it predates the landmark format. Our version
    slices x[1:5] and handles both; parity is checked where the
    reference actually runs."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = root / "images" / "0--Ev"
    lbl_dir = root / "labels" / "0--Ev"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(n_images):
        h, w = int(rng.integers(100, 200)), int(rng.integers(100, 200))
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    rng.integers(0, 255, (h, w, 3), np.uint8))
        rows = []
        for _ in range(int(rng.integers(1, 4))):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            bw, bh = rng.uniform(0.1, 0.3, 2)
            rows.append(f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        (lbl_dir / f"im{i}.txt").write_text("\n".join(rows) + "\n")
    return str(root / "images")


def test_create_folder_and_flatten_recursive(tmp_path):
    from face_detection_multi_scale_tpu.data.dataset import (
        create_folder, flatten_recursive)

    d = tmp_path / "tree"
    (d / "a" / "b").mkdir(parents=True)
    (d / "a" / "x.txt").write_text("1")
    (d / "a" / "b" / "y.txt").write_text("2")
    flat = flatten_recursive(d)
    assert sorted(p.name for p in flat.iterdir()) == ["x.txt", "y.txt"]
    create_folder(flat)  # recreates empty
    assert list(flat.iterdir()) == []


def test_extract_boxes_byte_parity(tmp_path):
    imgs_a = _make_box_only_dataset(tmp_path / "a")
    imgs_b = _make_box_only_dataset(tmp_path / "b")
    extract_boxes(imgs_a)
    ref("utils.datasets").extract_boxes(imgs_b)
    got = sorted((Path(imgs_a) / "classifier").rglob("*.jpg"))
    want = sorted((Path(imgs_b) / "classifier").rglob("*.jpg"))
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g.name == w.name
        assert g.read_bytes() == w.read_bytes()
