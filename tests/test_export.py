"""StableHLO export round-trip: serialize with fused postprocess, reload,
and match the live pipeline's outputs."""

import numpy as np
import pytest

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
