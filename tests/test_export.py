"""StableHLO export round-trip: serialize with fused postprocess, reload,
and match the live pipeline's outputs."""

import numpy as np

from face_detection_multi_scale_tpu import export_model as EM
from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.ops import nms as NMS


def test_stablehlo_roundtrip(tmp_path):
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    path = str(tmp_path / "m.stablehlo")
    EM.export_stablehlo(model, variables, spec, path, img_size=64,
                        batch=1, include_postprocess=True,
                        conf_thres=0.05, iou_thres=0.5, max_det=20)
    import json
    import os

    assert os.path.getsize(path) > 100_000  # weights baked in
    meta = json.load(open(path + ".json"))
    assert meta["max_det"] == 20 and meta["img_size"] == 64

    fn = EM.load_stablehlo(path)
    x = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8)
    boxes, scores, classes, extras, valid = fn(x)
    assert boxes.shape == (1, 20, 4)
    assert extras.shape == (1, 20, 15)

    # must equal the live pipeline
    raws = model.apply(variables, np.asarray(x, np.float32) / 255.0,
                       train=False)
    want = NMS.non_max_suppression(decode(raws, spec), 0.05, 0.5, nc=1,
                                   nkpt=5, max_candidates=2048, max_det=20)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_allclose(np.asarray(boxes)[v],
                               np.asarray(want.boxes)[v], atol=1e-4)


def test_stablehlo_raw_heads(tmp_path):
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    path = str(tmp_path / "raw.stablehlo")
    EM.export_stablehlo(model, variables, spec, path, img_size=64,
                        batch=1, raw_heads=True)
    fn = EM.load_stablehlo(path)
    x = np.zeros((1, 64, 64, 3), np.uint8)
    outs = fn(x)
    assert len(outs) == spec.nl
    assert outs[0].shape == (1, 3, 8, 8, 21)


def test_savedmodel_roundtrip(tmp_path):
    """jax2tf SavedModel export: reload through TensorFlow serving's
    entry point and match the jax engine's detections."""
    import tensorflow as tf

    from face_detection_multi_scale_tpu.export_model import (
        export_savedmodel)
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    path = str(tmp_path / "sm")
    export_savedmodel(model, variables, spec, path, img_size=128,
                      batch=2, conf_thres=0.001, max_det=20)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 128, 128, 3), np.uint8)

    loaded = tf.saved_model.load(path)
    out = loaded.signatures["serving_default"](tf.constant(x))
    # jax2tf names flat outputs output_0..output_N in function order
    got = [np.asarray(out[f"output_{i}"]) for i in range(len(out))]

    import jax.numpy as jnp

    raws = model.apply(variables, jnp.asarray(x, jnp.float32) / 255.0,
                       train=False)
    d = NMS.non_max_suppression(decode(raws, spec), 0.001, 0.45,
                                nc=spec.nc, nkpt=spec.nkpt,
                                max_candidates=2048, max_det=20)
    want = [np.asarray(v) for v in
            (d.boxes, d.scores, d.classes, d.extras, d.valid)]
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.shape == w.shape, (i, g.shape, w.shape)
        np.testing.assert_allclose(np.asarray(g, np.float64),
                                   np.asarray(w, np.float64), atol=1e-3,
                                   err_msg=f"output_{i}")
