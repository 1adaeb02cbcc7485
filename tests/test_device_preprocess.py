"""Device-side fused preprocess vs the host cv2 oracle.

The host path (data/letterbox.py) is bit-exact with the reference; the
device path (infer/device_preprocess.py) must match its geometry EXACTLY
(same scale/pad arithmetic -> same coordinate inverses) and its pixels to
within the documented float-vs-fixed-point bilinear tolerance (<=2.5/255).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from face_detection_multi_scale_tpu.data import letterbox as LB
from face_detection_multi_scale_tpu.infer import device_preprocess as DP

SHAPES = [(480, 640), (1080, 1920), (500, 375), (640, 640), (123, 457)]


def rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("auto", [True, False])
@pytest.mark.parametrize("hw", SHAPES)
def test_geometry_matches_host_letterbox(hw, auto):
    img = rand_img(*hw)
    out, ratio, (dw, dh) = LB.letterbox(img, 640, auto=auto, stride=32)
    geom = DP.letterbox_geometry(hw, 640, auto=auto, stride=32)
    assert geom.out_hw == out.shape[:2]
    assert geom.new_unpad == (int(round(hw[1] * ratio[0])),
                              int(round(hw[0] * ratio[1])))
    top, bottom, left, right = geom.pad_tblr
    assert (left + right, top + bottom) == (int(round(dw - 0.1))
                                            + int(round(dw + 0.1)),
                                            int(round(dh - 0.1))
                                            + int(round(dh + 0.1)))


@pytest.mark.parametrize("hw", SHAPES)
def test_device_letterbox_pixels_close_to_cv2(hw):
    img = rand_img(*hw, seed=1)
    host = LB.preprocess_standard(img, 640, 32, auto=True)  # RGB u8
    geom = DP.letterbox_geometry(hw, 640, auto=True, stride=32)
    dev = np.asarray(DP.device_letterbox(jnp.asarray(img[None]), geom))[0]
    assert dev.shape == host.shape
    diff = np.abs(dev - host.astype(np.float32) / 255.0)
    # bilinear float vs cv2 fixed-point: <=2.5/255 per pixel, tiny mean
    assert diff.max() <= 2.5 / 255.0, diff.max()
    assert diff.mean() <= 0.5 / 255.0, diff.mean()


@pytest.mark.parametrize("hw", SHAPES)
def test_device_api_chain_close_to_host(hw):
    img_rgb = rand_img(*hw, seed=2)
    host = LB.preprocess_api(img_rgb, 640, 32)
    dev = np.asarray(DP.device_preprocess_api(
        jnp.asarray(img_rgb[None]), 640))[0]
    assert dev.shape == host.shape
    diff = np.abs(dev - host.astype(np.float32) / 255.0)
    assert diff.max() <= 2.5 / 255.0, diff.max()
    assert diff.mean() <= 0.5 / 255.0, diff.mean()


def test_detector_device_preprocess_contract(tmp_path):
    """FaceDetector(use_device_preprocess=True): single-scale, multi-scale
    (one raw upload for all scales), and uniform-shape batch paths all
    produce the (n, 7)/(n, 6+) contracts; detections agree with the host
    path on a high-contrast synthetic face."""
    import cv2

    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    img = np.full((240, 320, 3), 20, np.uint8)
    img[84:156, 120:200] = 230
    p = str(tmp_path / "img.jpg")
    cv2.imwrite(p, img)

    kw = dict(img_sizes=(128, 256), conf_thres=0.001, max_det=32,
              max_candidates=1024, seed=0)
    det_host = FaceDetector("yolov7-lite-t", **kw)
    det_dev = FaceDetector("yolov7-lite-t", use_device_preprocess=True,
                           **kw)

    d_host, shape_h, _ = det_host.detect_single_scale(p, 128)
    d_dev, shape_d, _ = det_dev.detect_single_scale(p, 128)
    assert d_dev.shape[1] == 7 and tuple(shape_d)[:2] == tuple(
        shape_h)[:2]
    # top-confidence boxes agree within a couple of pixels (preprocess
    # numerics differ by <=2.5/255; random weights amplify slightly)
    n = min(3, len(d_host), len(d_dev))
    assert n > 0
    np.testing.assert_allclose(d_dev[:n, :4], d_host[:n, :4], atol=6)

    multi, _ = det_dev.detect_multi_scale(p)
    assert multi.shape[1] == 7

    batch = det_dev.detect_batch([p, p], 128)
    assert len(batch) == 2
    if len(batch[0]) and len(batch[1]):
        np.testing.assert_allclose(batch[0][:2, :4], batch[1][:2, :4],
                                   atol=1e-6)
