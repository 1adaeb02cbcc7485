"""Infra utilities: apply_classifier second-stage hook, save_one_box,
increment_path (reference utils/general.py:682-744), and legacy hub cfg
parseability (reference models/hub/*.yaml)."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.utils.general import (
    apply_classifier, increment_path, save_one_box)

from oracle import import_reference

ref = import_reference()


def _fake_scene(seed, n_img=2, n_det=3, h=240, w=320):
    rng = np.random.default_rng(seed)
    im0s = [rng.integers(0, 255, (h, w, 3), np.uint8)
            for _ in range(n_img)]
    dets = []
    for _ in range(n_img):
        x1 = rng.uniform(10, 100, n_det)
        y1 = rng.uniform(10, 100, n_det)
        rows = np.stack([
            x1, y1, x1 + rng.uniform(20, 60, n_det),
            y1 + rng.uniform(20, 60, n_det),
            rng.uniform(0.3, 1.0, n_det),
            rng.integers(0, 2, n_det).astype(np.float64)], axis=1)
        dets.append(rows.astype(np.float32))
    return im0s, dets


def test_apply_classifier_matches_reference():
    """Same crops, same agreement filter as the reference hook
    (utils/general.py:682-714); ours makes one batched NHWC call."""
    import torch

    im0s, dets = _fake_scene(0)
    img_shape = (192, 192)  # network-input frame

    def classify_brightness_np(batch_nhwc):
        # deterministic stand-in classifier: class = mean > 0.5
        return (batch_nhwc.mean(axis=(1, 2, 3)) > 0.5).astype(int)

    class TorchBrightness(torch.nn.Module):
        def forward(self, x):  # x: (N, 3, 224, 224) in [0,1]
            m = x.mean(dim=(1, 2, 3))
            return torch.stack([(m <= 0.5).float(), (m > 0.5).float()], 1)

    got = apply_classifier(dets, classify_brightness_np, img_shape, im0s)

    general = ref("utils.general")
    x = [torch.from_numpy(d.copy()) for d in dets]
    fake_img = torch.zeros(len(im0s), 3, *img_shape)
    want = general.apply_classifier(x, TorchBrightness(), fake_img,
                                    [im.copy() for im in im0s])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=1e-6)


def test_apply_classifier_empty_and_passthrough():
    im0s, dets = _fake_scene(1)
    empty = [np.zeros((0, 6), np.float32) for _ in im0s]
    out = apply_classifier(empty, lambda b: np.zeros(len(b)), (192, 192),
                           im0s)
    assert all(len(o) == 0 for o in out)
    # a classifier that always agrees keeps everything
    agree_all = apply_classifier(
        dets, lambda b: np.array([1e9] * len(b)), (192, 192), im0s)
    assert all(len(a) == 0 for a in agree_all)  # 1e9 never equals cls


def test_save_one_box_matches_reference(tmp_path):
    import cv2

    rng = np.random.default_rng(3)
    im = rng.integers(0, 255, (200, 300, 3), np.uint8)
    box = [40.0, 50.0, 120.0, 140.0]
    ours = save_one_box(box, im, file=tmp_path / "ours" / "crop.jpg")
    general = ref("utils.general")
    import torch
    general.save_one_box(torch.tensor(box), im,
                         file=tmp_path / "ref" / "crop.jpg")
    want = cv2.imread(str(tmp_path / "ref" / "crop.jpg"))
    got = cv2.imread(str(ours))
    np.testing.assert_array_equal(got, want)


def test_increment_path(tmp_path):
    p = tmp_path / "exp"
    assert increment_path(p) == p
    p.mkdir()
    assert increment_path(p) == tmp_path / "exp2"
    (tmp_path / "exp2").mkdir()
    assert increment_path(p) == tmp_path / "exp3"
    assert increment_path(p, exist_ok=True) == p
    f = increment_path(tmp_path / "runs" / "x.jpg", mkdir=True)
    assert f.parent.is_dir()


def test_colorstr_matches_reference():
    from face_detection_multi_scale_tpu.utils.general import colorstr

    general = ref("utils.general")
    for args in (("hello",), ("red", "x"), ("green", "bold", "y")):
        assert colorstr(*args) == general.colorstr(*args)


def test_check_file_and_dataset(tmp_path, monkeypatch):
    from face_detection_multi_scale_tpu.utils.general import (
        check_dataset, check_file)

    f = tmp_path / "sub" / "cfg.yaml"
    f.parent.mkdir()
    f.write_text("x: 1")
    assert check_file(str(f)) == str(f)
    monkeypatch.chdir(tmp_path)
    assert check_file("cfg.yaml").endswith("sub/cfg.yaml")
    with pytest.raises(AssertionError):
        check_file("nope.yaml")

    check_dataset({"val": str(tmp_path / "sub")})  # exists: no-op
    with pytest.raises(FileNotFoundError):
        check_dataset({"val": str(tmp_path / "missing")})
    # a python download recipe runs
    marker = tmp_path / "dl.txt"
    check_dataset({"val": str(tmp_path / "missing"),
                   "download": f"open({str(marker)!r}, 'w').write('1')"})
    assert marker.exists()


def test_init_seeds():
    import random

    from face_detection_multi_scale_tpu.utils.general import init_seeds

    key = init_seeds(7)
    a = (random.random(), np.random.rand())
    init_seeds(7)
    b = (random.random(), np.random.rand())
    assert a == b and key is not None


@pytest.mark.parametrize("name", ["yolov3", "yolov3-spp", "yolov3-tiny"])
def test_legacy_hub_cfgs_parse(name):
    """The legacy hub cfgs (reference models/hub/) parse through
    load_spec — the face pipeline never instantiates them (they use the
    plain Detect head), but the graph-builder surface accepts them."""
    from face_detection_multi_scale_tpu.models.spec import load_spec

    s = load_spec(f"/root/reference/models/hub/{name}.yaml")
    assert s.nc == 80 and s.nodes[-1].op == "Detect"
    assert len(s.nodes) > 10


def test_segment_utils_match_reference():
    from face_detection_multi_scale_tpu.utils.general import (
        clip_coords, resample_segments, segment2box, segments2boxes,
        xyn2xy)

    general = ref("utils.general")
    rng = np.random.default_rng(6)
    seg = rng.uniform(0, 1, (12, 2))
    np.testing.assert_allclose(xyn2xy(seg, 200, 100, 3, 5),
                               general.xyn2xy(seg, 200, 100, 3, 5))
    px = rng.uniform(-50, 700, (15, 2))
    np.testing.assert_allclose(segment2box(px.copy(), 640, 640),
                               general.segment2box(px.copy(), 640, 640))
    all_out = np.full((4, 2), -10.0)
    np.testing.assert_allclose(segment2box(all_out, 64, 64),
                               general.segment2box(all_out, 64, 64))
    segs = [rng.uniform(0, 640, (k, 2)) for k in (5, 9)]
    np.testing.assert_allclose(
        segments2boxes([s.copy() for s in segs]),
        general.segments2boxes([s.copy() for s in segs]))
    ours_rs = resample_segments([s.copy() for s in segs], n=50)
    theirs_rs = general.resample_segments([s.copy() for s in segs], n=50)
    for a, b in zip(ours_rs, theirs_rs):
        np.testing.assert_allclose(a, b)
    boxes = rng.uniform(-30, 700, (6, 4))
    want = boxes.copy()
    import torch
    tb = torch.from_numpy(boxes.copy())
    general.clip_coords(tb, (480, 640))
    np.testing.assert_allclose(clip_coords(want, (480, 640)), tb.numpy())


def test_misc_small_utils(tmp_path):
    from face_detection_multi_scale_tpu.utils.general import (
        clean_str, coco80_to_coco91_class, file_size, get_latest_run)

    general = ref("utils.general")
    s = "rtsp://u:p@host/stream?x=1|y"
    assert clean_str(s) == general.clean_str(s)
    assert coco80_to_coco91_class() == general.coco80_to_coco91_class()
    f = tmp_path / "x.bin"
    f.write_bytes(b"0" * 2_000_000)
    assert abs(file_size(f) - 2.0) < 1e-6
    assert get_latest_run(str(tmp_path)) == ""
    run = tmp_path / "runs" / "exp" / "weights"
    run.mkdir(parents=True)
    (run / "last.meta.json").write_text("{}")
    assert get_latest_run(str(tmp_path)).endswith("last.meta.json")
