"""W8A8 quantized inference (models/quant.py): structure, numerics, and
detector integration.

The reference has no quantized path — this is the TPU-first
byte-reduction lever for the HBM-bound forward (PERF.md §3e roofline;
measured on-chip: bytes 38.6 -> 23.4 GB, 99 -> 73 ms/batch for
yolov7-w6-face@640 b128, tools/QUANT_AB.json). These tests pin the
scheme's correctness contract on CPU: calibrated scales, concat-group
unification, int32-accumulate conv epilogue, and the same raw-map /
Detections contract as the float engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import quant, zoo
from face_detection_multi_scale_tpu.models.fuse import fold_bn
from face_detection_multi_scale_tpu.models.model import init_model


def _noisy_model(name, img_size=64, seed=3, noise=0.05):
    """Init + small weight noise: an untrained net is near-constant
    (sigmoid(0) everywhere) and would make quantization trivially
    lossless; noise gives real activation ranges."""
    spec = zoo.get_spec(name)
    model, variables = init_model(spec, img_size=img_size)
    prng = np.random.RandomState(seed)
    leaves, treedef = jax.tree.flatten(variables)
    variables = jax.tree.unflatten(
        treedef, [l + noise * prng.normal(size=l.shape).astype(np.float32)
                  for l in leaves])
    return spec, model, variables


def _calib_batch(img_size=64, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (batch, img_size, img_size, 3),
                       np.uint8).astype(np.float32) / 255.0


def test_quant_forward_matches_float():
    """Raw maps from the W8A8 executor track the float forward within
    accumulated per-layer quantization error."""
    spec, model, variables = _noisy_model("yolov7-tiny-face")
    x = _calib_batch()
    calib = quant.calibrate(spec, variables, jnp.asarray(x))
    qparams = quant.quantize(spec, variables, calib)

    raws_q = quant.quant_apply(spec, qparams, jnp.asarray(x),
                               dtype=jnp.float32)
    raws_f = model.apply(fold_bn(variables), jnp.asarray(x), train=False)
    assert len(raws_q) == len(raws_f)
    for rq, rf in zip(raws_q, raws_f):
        rq, rf = np.asarray(rq), np.asarray(rf)
        assert rq.shape == rf.shape
        # head logits: int8 activations accumulate ~1% relative error
        err = np.abs(rq - rf)
        scale = np.abs(rf).max()
        assert err.max() < 0.06 * scale, (err.max(), scale)
        corr = np.corrcoef(rq.ravel(), rf.ravel())[0, 1]
        assert corr > 0.998, corr


def test_concat_groups_share_scale():
    """Tensors meeting in a Concat must quantize with ONE scale so the
    int8 concatenation is exact: every conv feeding a concat group maps
    to the same grouped amax."""
    spec, model, variables = _noisy_model("yolov7-tiny-face")
    calib = quant.calibrate(spec, variables, jnp.asarray(_calib_batch()))
    groups = {}
    for tag, amax in calib.amax.items():
        root = calib.groups.find(tag)
        groups.setdefault(root, set()).add(amax)
    # at least one real multi-member group exists in tiny-face (its
    # ELAN-style concats), and every group has exactly one scale
    multi = [g for g in groups.values() if len(g) >= 1]
    assert len(multi) == len(groups)
    for g in groups.values():
        assert len(g) == 1


def test_shape_only_calibration_structure_matches():
    """calibrate_shape_only (no compute) discovers the same tag graph as
    the real data calibration — the perf probe's structural shortcut."""
    spec, model, variables = _noisy_model("yolov7-tiny-face")
    real = quant.calibrate(spec, variables, jnp.asarray(_calib_batch()))
    shape = quant.calibrate_shape_only(spec, variables)
    assert real.in_tag == shape.in_tag
    assert real.head_in_tags == shape.head_in_tags
    assert set(real.amax) == set(shape.amax)
    # unification must agree too
    for t in real.amax:
        peers_r = {u for u in real.amax
                   if real.groups.find(u) == real.groups.find(t)}
        peers_s = {u for u in shape.amax
                   if shape.groups.find(u) == shape.groups.find(t)}
        assert peers_r == peers_s, t


def test_qparams_are_jit_arguments():
    """The qparams tree is pure arrays (passable as a jit ARGUMENT —
    the relay's closure-inlining constraint, CLAUDE.md) and the int8
    kernels round-trip through jit."""
    spec, model, variables = _noisy_model("yolov7-tiny-face")
    qparams = quant.quantize_model(spec, variables,
                                   jnp.asarray(_calib_batch()))
    for leaf in jax.tree.leaves(qparams):
        assert isinstance(leaf, jnp.ndarray)
    w_dtypes = {v["w"].dtype for v in qparams["convs"].values()}
    assert w_dtypes == {jnp.dtype(jnp.int8)}

    x = jnp.asarray(_calib_batch(batch=1))
    fn = jax.jit(lambda q, xx: quant.quant_apply(spec, q, xx,
                                                 dtype=jnp.float32))
    raws = fn(qparams, x)
    ref = quant.quant_apply(spec, qparams, x, dtype=jnp.float32)
    for a, b in zip(raws, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


@pytest.mark.parametrize("name", ["yolov7s-face", "yolov7-lite-t"])
def test_quant_supports_spp_family(name):
    """Composite blocks inline their internal convs as first-class
    quantization points and the executor runs them end to end: s-face's
    SPPF/SPPCSPC and lite's StemBlock / Shuffle_Block (channel
    split+shuffle pass int8 through) / DWConvblock / requanted ADD."""
    spec, model, variables = _noisy_model(name, img_size=64)
    x = jnp.asarray(_calib_batch(img_size=64, batch=1))
    qparams = quant.quantize_model(spec, variables, x)
    raws_q = quant.quant_apply(spec, qparams, x, dtype=jnp.float32)
    raws_f = model.apply(fold_bn(variables), x, train=False)
    for rq, rf in zip(raws_q, raws_f):
        assert np.corrcoef(np.asarray(rq).ravel(),
                           np.asarray(rf).ravel())[0, 1] > 0.995


def test_detector_int8_end_to_end():
    """FaceDetector(quantize='int8'): lazy first-batch calibration, same
    Detections contract, detections close to the float engine's."""
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    spec, model, variables = _noisy_model("yolov7-tiny-face")
    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (96, 128, 3), np.uint8)

    kw = dict(model="yolov7-tiny-face", img_sizes=(64,), conf_thres=0.05,
              iou_thres=0.5, max_det=20, max_candidates=256)
    det_f = FaceDetector(variables=variables, **kw)
    det_q = FaceDetector(variables=variables, quantize="int8", **kw)
    assert det_q._qparams is None  # calibration is lazy

    rows_f, _, _ = det_f.detect_single_scale(img, 64)
    rows_q, _, _ = det_q.detect_single_scale(img, 64)
    assert det_q._qparams is not None
    assert rows_q.shape[1] == rows_f.shape[1]
    # same detection count within 1 and matching top box
    assert abs(len(rows_q) - len(rows_f)) <= 1
    if len(rows_f) and len(rows_q):
        np.testing.assert_allclose(rows_q[0][:4], rows_f[0][:4], atol=2.0)
        assert abs(rows_q[0][4] - rows_f[0][4]) < 0.02

    # second call must reuse the calibration (no re-quantization)
    qid = id(det_q._qparams)
    det_q.detect_single_scale(img, 64)
    assert id(det_q._qparams) == qid


def test_detector_int8_lite_family():
    """Round 5 extended the quantized executor to the lite family
    (StemBlock / Shuffle_Block / DWConvblock / ADD): the detector
    constructs, calibrates lazily, and produces detections matching the
    float engine's contract."""
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    spec, model, variables = _noisy_model("yolov7-lite-t")
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (96, 128, 3), np.uint8)

    kw = dict(model="yolov7-lite-t", img_sizes=(64,), conf_thres=0.05,
              iou_thres=0.5, max_det=20, max_candidates=256)
    det_f = FaceDetector(variables=variables, **kw)
    det_q = FaceDetector(variables=variables, quantize="int8", **kw)
    rows_f, _, _ = det_f.detect_single_scale(img, 64)
    rows_q, _, _ = det_q.detect_single_scale(img, 64)
    assert rows_q.shape[1] == rows_f.shape[1]
    assert abs(len(rows_q) - len(rows_f)) <= 1
    if len(rows_f) and len(rows_q):
        np.testing.assert_allclose(rows_q[0][:4], rows_f[0][:4], atol=2.0)
        assert abs(rows_q[0][4] - rows_f[0][4]) < 0.05
