"""Augmented-inference TTA: scale_img and descale semantics, ensemble."""

import numpy as np
import pytest

import jax.numpy as jnp

from face_detection_multi_scale_tpu.infer import augment as A


def test_scale_img_shapes_and_padding():
    x = jnp.ones((1, 128, 128, 3))
    y = A.scale_img(x, 0.83, gs=32)
    # ceil(128*0.83/32)*32 = ceil(106.24/32)*32 = 128
    assert y.shape == (1, 128, 128, 3)
    # resized region is 106x106; padding carries 0.447
    assert float(y[0, 120, 120, 0]) == pytest.approx(A.PAD_VALUE)
    assert A.scale_img(x, 1.0) is x


def test_descale_lr_flip_roundtrip():
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 640, (1, 50, 21)).astype(np.float32)
    img_hw = (640, 640)
    # lr flip: x' = W - x; descale twice returns original
    once = A.descale_pred(jnp.asarray(p), "lr", 1.0, img_hw)
    twice = A.descale_pred(once, "lr", 1.0, img_hw)
    np.testing.assert_allclose(np.asarray(twice), p, atol=1e-4)
    # scale inversion
    scaled = A.descale_pred(jnp.asarray(p), None, 2.0, img_hw)
    np.testing.assert_allclose(np.asarray(scaled[..., :4]), p[..., :4] / 2,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(scaled[..., 4:]), p[..., 4:],
                               atol=1e-5)


def test_forward_augment_counts():
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model

    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    x = jnp.zeros((1, 128, 128, 3))
    out = A.forward_augment(model, variables, x)
    # scales 1 / 0.83 / 0.67 on a 128 canvas -> 128, 128 (padded), 96
    n1 = (16 * 16 + 8 * 8 + 4 * 4) * 3
    n2 = n1  # 0.83 pads back to 128
    n3 = (12 * 12 + 6 * 6 + 3 * 3) * 3
    assert out.shape == (1, n1 + n2 + n3, 21)

    flip = A.forward_flip_test(model, variables, x)
    assert flip.shape == (1, 2 * n1, 21)


def test_ensemble_concat():
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector
    from face_detection_multi_scale_tpu.infer.ensemble import (
        EnsembleDetector)

    d1 = FaceDetector("yolov7-lite-t", img_sizes=(64,), conf_thres=0.01,
                      max_det=50, seed=0)
    d2 = FaceDetector("yolov7-lite-t", img_sizes=(64,), conf_thres=0.01,
                      max_det=50, seed=1)
    ens = EnsembleDetector([d1, d2])
    imgs = np.zeros((1, 64, 64, 3), np.uint8)
    dets = ens.run_network(imgs)
    assert dets.boxes.shape == (1, 50, 4)
