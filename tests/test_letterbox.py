"""Parity tests: letterbox / pad-to-square / scale_coords vs the reference."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.data import letterbox as L

from oracle import import_reference, seeded_torch, torch_to_numpy

ref = import_reference()


def random_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("hw,new,auto,scaleup", [
    ((480, 640), 640, False, True),
    ((480, 640), 640, True, True),
    ((1024, 768), 640, False, True),
    ((333, 517), 960, True, True),
    ((200, 100), 640, False, False),
    ((1080, 1920), (640, 640), False, True),
])
def test_letterbox_parity(hw, new, auto, scaleup):
    datasets = ref("utils.datasets")
    img = random_image(*hw, seed=hash((hw, str(new))) % 2**31)
    want_img, want_ratio, want_pad = datasets.letterbox(
        img.copy(), new, auto=auto, scaleup=scaleup)
    got_img, got_ratio, got_pad = L.letterbox(
        img.copy(), new, auto=auto, scaleup=scaleup)
    assert got_img.shape == want_img.shape
    np.testing.assert_array_equal(got_img, want_img)
    assert got_ratio == tuple(want_ratio)
    assert got_pad == tuple(want_pad)


def test_pad_to_square_top_left():
    pre = ref("utils.preprocess_yolo_predict")
    img = random_image(300, 500, seed=7)
    want = pre.pad_to_square_top_left(img.copy())
    got = L.pad_to_square_top_left(img.copy())
    np.testing.assert_array_equal(got, want)


def test_preprocess_api_matches_reference_chain():
    pre = ref("utils.preprocess_yolo_predict")
    datasets = ref("utils.datasets")
    img = random_image(413, 781, seed=11)
    squared = pre.pad_to_square_top_left(img.copy())
    want = datasets.letterbox(squared, 640, stride=32, auto=False)[0]
    got = L.preprocess_api(img.copy(), 640, stride=32)
    np.testing.assert_array_equal(got, want)


def test_scale_coords_parity():
    general = ref("utils.general")
    torch = seeded_torch(3)
    coords = torch.rand(13, 4) * 640
    coords_np = coords.numpy().astype(np.float64).copy()
    want = torch_to_numpy(general.scale_coords((640, 640), coords.clone(), (480, 710)))
    got = L.scale_coords((640, 640), coords_np, (480, 710))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_scale_coords_kpt_parity():
    general = ref("utils.general")
    torch = seeded_torch(4)
    coords = torch.rand(7, 15) * 640  # 5 landmarks x (x, y, conf)
    coords_np = coords.numpy().astype(np.float64).copy()
    want = torch_to_numpy(general.scale_coords(
        (960, 960), coords.clone(), (1024, 683), kpt_label=True, step=3))
    got = L.scale_coords((960, 960), coords_np, (1024, 683), kpt=True, step=3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_scale_coords_api_parity():
    pre = ref("utils.preprocess_yolo_predict")
    torch = seeded_torch(5)
    coords = torch.rand(9, 4) * 640
    coords_np = coords.numpy().astype(np.float64).copy()
    want = torch_to_numpy(pre.scale_coords_api_approach(
        (640, 640), coords.clone(), (480, 710, 3)))
    got = L.scale_coords_api((640, 640), coords_np, (480, 710, 3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
