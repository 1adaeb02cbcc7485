"""Round-trip tests for the native ONNX export (onnx/export.py).

The reference interchanges models as ONNX (reference
models/export.py:85-132; raw-head variant cpp/export.py:62-70).  This
image has no onnx/onnxruntime packages, so the round trip is proven
with the repo's own independent numpy executor (onnx/runner.py): the
serialized file is re-parsed from bytes and re-executed with numpy
only, then compared against model.apply.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.fuse import fold_bn
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.onnx import onnx_pb2 as pb
from face_detection_multi_scale_tpu.onnx import runner
from face_detection_multi_scale_tpu.onnx.export import export_onnx_native


def _roundtrip(name, tmp_path, *, raw_heads, img_size=64, batch=2):
    spec = zoo.get_spec(name)
    model, variables = init_model(spec, img_size=img_size)
    path = str(tmp_path / f"{name}.onnx")
    export_onnx_native(model, variables, spec, path,
                       img_size=img_size, batch=batch, raw_heads=raw_heads)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (batch, img_size, img_size, 3), np.uint8)
    outs = runner.run_onnx(path, {"images": img})

    fv = fold_bn(variables)
    raws = model.apply(fv, img.astype(jnp.float32) / 255.0, train=False)
    refs = list(raws) if raw_heads else [decode(raws, spec)]
    assert len(outs) == len(refs)
    for ref, got in zip(refs, outs):
        ref = np.asarray(ref)
        assert ref.shape == got.shape
        # f32 conv reassociation noise on pixel-scale activations
        np.testing.assert_allclose(ref, got, atol=5e-4, rtol=1e-4)
    return path


def test_tiny_decoded_roundtrip(tmp_path):
    path = _roundtrip("yolov7-tiny-face", tmp_path, raw_heads=False)

    # Structural checks on the artifact itself: parses from bytes,
    # static shapes, opset 13, weights present as named initializers.
    m = runner.load_model(path)
    assert m.ir_version >= 7
    assert m.opset_import[0].version == 13
    g = m.graph
    assert [vi.name for vi in g.input] == ["images"]
    dims = [d.dim_value for d in g.input[0].type.tensor_type.shape.dim]
    assert dims == [2, 64, 64, 3]
    assert g.input[0].type.tensor_type.elem_type == pb.TensorProto.UINT8
    ops = {n.op_type for n in g.node}
    assert {"Conv", "MaxPool", "Sigmoid", "Concat"} <= ops
    # every conv kernel is a named initializer in OIHW
    init_names = [t.name for t in g.initializer]
    assert any(n.startswith("p.") for n in init_names)
    assert len(init_names) == len(set(init_names))


def test_tiny_raw_heads_roundtrip(tmp_path):
    _roundtrip("yolov7-tiny-face", tmp_path, raw_heads=True)


def test_export_onnx_entrypoint_sidecar(tmp_path):
    from face_detection_multi_scale_tpu import export_model as EM

    spec = zoo.get_spec("yolov7-tiny-face")
    model, variables = init_model(spec, img_size=64)
    path = str(tmp_path / "m.onnx")
    EM.export_onnx(model, variables, spec, path, img_size=64, batch=1)
    import json
    meta = json.load(open(path + ".json"))
    assert meta["engine"] == "native"
    assert meta["output"] == "decoded (bs, N, no)"
    # the native path emits opset 13 only; raw heads can't be fused
    with pytest.raises(ValueError):
        EM.export_onnx(model, variables, spec, path, img_size=64,
                       opset=11, engine="native")
    with pytest.raises(ValueError):
        EM.export_onnx(model, variables, spec, path, img_size=64,
                       include_postprocess=True, raw_heads=True)
    # the tf2onnx bridge exports decoded graphs only — never silently
    # drop a requested raw-heads contract
    with pytest.raises(ValueError):
        EM.export_onnx(model, variables, spec, path, img_size=64,
                       raw_heads=True, engine="tf2onnx")


def test_fused_nms_roundtrip(tmp_path):
    """--export-nms equivalent: decode + ONNX NonMaxSuppression fused
    into one native artifact (reference models/export.py:78-132,
    NMS_Export models/common.py:543-568), round-tripped through the
    numpy executor and matched row-for-row against the live engine
    (ops/nms.non_max_suppression)."""
    from face_detection_multi_scale_tpu.onnx.export import (
        export_onnx_native_fused)
    from face_detection_multi_scale_tpu.ops import nms as NMS

    conf_thres, iou_thres, max_det = 0.05, 0.5, 20
    batch, img_size = 2, 64
    spec = zoo.get_spec("yolov7-tiny-face")
    model, variables = init_model(spec, img_size=img_size)
    # an untrained net scores every cell ~sigmoid(0)^2 = 0.25 — a wall
    # of ties the two greedy-NMS implementations break differently.
    # Small weight noise separates the scores without saturating them.
    prng = np.random.RandomState(3)
    leaves, treedef = jax.tree.flatten(variables)
    variables = jax.tree.unflatten(
        treedef, [l + 0.05 * prng.normal(size=l.shape).astype(np.float32)
                  for l in leaves])
    path = str(tmp_path / "fused.onnx")
    export_onnx_native_fused(model, variables, spec, path,
                             img_size=img_size, batch=batch,
                             conf_thres=conf_thres, iou_thres=iou_thres,
                             max_det=max_det)

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (batch, img_size, img_size, 3), np.uint8)
    boxes, scores, classes, extras, batch_idx = runner.run_onnx(
        path, {"images": img})

    raws = model.apply(fold_bn(variables),
                       img.astype(jnp.float32) / 255.0, train=False)
    d = NMS.non_max_suppression(decode(raws, spec), conf_thres, iou_thres,
                                nc=spec.nc, nkpt=spec.nkpt,
                                max_candidates=256, max_det=max_det)
    total = int(np.asarray(d.valid).sum())
    assert total > 0  # untrained random weights still clear conf 0.05
    assert boxes.shape == (total, 4) and extras.shape == (total, 15)
    assert classes.shape == scores.shape == batch_idx.shape == (total,)
    np.testing.assert_array_equal(classes, 0.0)
    for bi in range(batch):
        sel = batch_idx == bi
        v = np.asarray(d.valid[bi])
        assert int(sel.sum()) == int(v.sum())
        # both sides emit keepers in descending-score order
        np.testing.assert_allclose(scores[sel], np.asarray(d.scores[bi])[v],
                                   atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(boxes[sel], np.asarray(d.boxes[bi])[v],
                                   atol=5e-3)
        np.testing.assert_allclose(extras[sel], np.asarray(d.extras[bi])[v],
                                   atol=5e-3)


def test_int8_quant_roundtrip(tmp_path):
    """W8A8 int8 export (ConvInteger bodies, int8 initializers) —
    the ONNX interchange of FaceDetector(quantize='int8'), the
    deployment analogue of the reference's int8-capable ncnn app
    (cpp/yolov7-face-ncnn, include/ncnn/mat.h:795-797) — round-tripped
    through the numpy executor against the live quantized forward
    (models/quant.quant_apply)."""
    from face_detection_multi_scale_tpu import export_model as EM
    from face_detection_multi_scale_tpu.models import quant

    batch, img_size = 2, 64
    spec = zoo.get_spec("yolov7-tiny-face")
    model, variables = init_model(spec, img_size=img_size)
    rng = np.random.RandomState(0)
    calib = jnp.asarray(rng.rand(2, img_size, img_size, 3), jnp.float32)
    qp = quant.quantize_model(spec, variables, calib)

    path = str(tmp_path / "tiny_int8.onnx")
    EM.export_onnx(model, variables, spec, path, img_size=img_size,
                   batch=batch, qparams=qp)

    img = rng.randint(0, 255, (batch, img_size, img_size, 3), np.uint8)
    (got,) = runner.run_onnx(path, {"images": img})
    ref = np.asarray(decode(
        quant.quant_apply(spec, qp, jnp.asarray(img), dtype=jnp.float32),
        spec))
    assert ref.shape == got.shape
    # the int8 spine is integer-exact; the float epilogues (dequant,
    # activation, decode) carry only reassociation noise
    np.testing.assert_allclose(ref, got, atol=2e-3, rtol=1e-3)

    # structural: quantized body convs are ConvInteger over int8
    # weights; the float head keeps standard Conv
    m = runner.load_model(path)
    ops = {n.op_type for n in m.graph.node}
    assert {"ConvInteger", "Conv", "Round", "Cast"} <= ops
    int8_inits = [t for t in m.graph.initializer
                  if t.data_type == pb.TensorProto.INT8]
    n_convint = sum(n.op_type == "ConvInteger" for n in m.graph.node)
    assert n_convint > 0 and len(int8_inits) >= n_convint
    meta = __import__("json").load(open(path + ".json"))
    assert meta["quantize"] == "int8"


def test_int8_quant_fused_nms(tmp_path):
    """int8 graph + the fused NonMaxSuppression tail in one artifact
    (--export-nms over the quantized forward), matched row-for-row
    against the live int8 engine."""
    from face_detection_multi_scale_tpu.models import quant
    from face_detection_multi_scale_tpu.onnx.export import (
        export_onnx_native_quant)
    from face_detection_multi_scale_tpu.ops import nms as NMS

    conf_thres, iou_thres, max_det = 0.05, 0.5, 20
    batch, img_size = 2, 64
    spec = zoo.get_spec("yolov7-tiny-face")
    model, variables = init_model(spec, img_size=img_size)
    prng = np.random.RandomState(3)
    leaves, treedef = jax.tree.flatten(variables)
    variables = jax.tree.unflatten(
        treedef, [l + 0.05 * prng.normal(size=l.shape).astype(np.float32)
                  for l in leaves])
    rng = np.random.RandomState(7)
    calib = jnp.asarray(rng.rand(2, img_size, img_size, 3), jnp.float32)
    qp = quant.quantize_model(spec, variables, calib)

    path = str(tmp_path / "tiny_int8_nms.onnx")
    export_onnx_native_quant(spec, qp, path, img_size=img_size,
                             batch=batch, include_postprocess=True,
                             conf_thres=conf_thres, iou_thres=iou_thres,
                             max_det=max_det)

    img = rng.randint(0, 255, (batch, img_size, img_size, 3), np.uint8)
    boxes, scores, classes, extras, batch_idx = runner.run_onnx(
        path, {"images": img})

    preds = decode(
        quant.quant_apply(spec, qp, jnp.asarray(img), dtype=jnp.float32),
        spec)
    d = NMS.non_max_suppression(preds, conf_thres, iou_thres,
                                nc=spec.nc, nkpt=spec.nkpt,
                                max_candidates=256, max_det=max_det)
    total = int(np.asarray(d.valid).sum())
    assert total > 0
    assert boxes.shape == (total, 4)
    for bi in range(batch):
        sel = batch_idx == bi
        v = np.asarray(d.valid[bi])
        assert int(sel.sum()) == int(v.sum())
        np.testing.assert_allclose(scores[sel],
                                   np.asarray(d.scores[bi])[v],
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(boxes[sel], np.asarray(d.boxes[bi])[v],
                                   atol=5e-2)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["yolov7-w6-face", "yolov7s-face"])
def test_family_roundtrip(name, tmp_path):
    _roundtrip(name, tmp_path, raw_heads=False)
