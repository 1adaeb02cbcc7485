"""Model export for deployment.

The reference exports TorchScript / ONNX / CoreML (reference
models/export.py:85-149) and raw-head ONNX for the ncnn C++ app
(reference cpp/export.py:62-70). The TPU-native equivalents here:

  * StableHLO via jax.export — a portable serialized artifact with the
    weights baked in, re-loadable on any XLA backend (TPU/CPU/GPU),
    optionally with the full postprocess (decode + fixed-capacity NMS)
    fused in, the analog of --export-nms (models/export.py:78,105).
  * TF SavedModel via jax2tf — the serving-container path.
  * raw-head mode: per-stride undecoded maps, the cpp/export.py contract
    for external runtimes (consumed by native/postprocess.cpp).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _build_fn(model, variables, spec, *, include_postprocess: bool,
              raw_heads: bool, conf_thres: float, iou_thres: float,
              max_det: int, dtype):
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.ops import nms as NMS

    def fn(images_u8):
        x = images_u8.astype(dtype) / 255.0
        raws = model.apply(variables, x, train=False)
        if raw_heads:
            return tuple(raws)  # per-stride (bs, na, ny, nx, no) maps
        preds = decode(raws, spec)
        if not include_postprocess:
            return preds
        d = NMS.non_max_suppression(
            preds, conf_thres, iou_thres, nc=spec.nc, nkpt=spec.nkpt,
            max_candidates=2048, max_det=max_det)
        return d.boxes, d.scores, d.classes, d.extras, d.valid

    return fn


def export_stablehlo(model, variables, spec, path: str, *,
                     img_size: int = 640, batch: int = 1,
                     include_postprocess: bool = True,
                     raw_heads: bool = False, conf_thres: float = 0.25,
                     iou_thres: float = 0.45, max_det: int = 300,
                     dtype=jnp.float32,
                     platforms: Optional[Sequence[str]] = None) -> str:
    """Serialize the jitted inference function (weights baked in) to a
    .stablehlo artifact + a JSON sidecar describing the contract."""
    from jax import export as jexport

    fn = _build_fn(model, variables, spec,
                   include_postprocess=include_postprocess,
                   raw_heads=raw_heads, conf_thres=conf_thres,
                   iou_thres=iou_thres, max_det=max_det, dtype=dtype)
    x_spec = jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.uint8)
    exported = jexport.export(
        jax.jit(fn),
        platforms=platforms)(x_spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "model": spec.name, "img_size": img_size, "batch": batch,
        "include_postprocess": include_postprocess, "raw_heads": raw_heads,
        "conf_thres": conf_thres, "iou_thres": iou_thres,
        "max_det": max_det, "nkpt": spec.nkpt, "nc": spec.nc,
        "strides": list(spec.strides),
        "input": "uint8 NHWC RGB, network-input frame",
        "output": ("per-stride raw maps" if raw_heads else
                   ("boxes,scores,classes,extras,valid" if
                    include_postprocess else "decoded (bs, N, no)")),
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_stablehlo(path: str):
    """Deserialize an exported artifact; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return jax.jit(exported.call)


def export_onnx(model, variables, spec, path: str, *,
                img_size: int = 640, batch: int = 1,
                include_postprocess: bool = False,
                raw_heads: bool = False,
                conf_thres: float = 0.25, iou_thres: float = 0.45,
                max_det: int = 300, dtype=jnp.float32,
                opset: int = 13, engine: str = "auto",
                qparams=None) -> str:
    """ONNX — the reference's actual interchange format
    (models/export.py:85-132, opset 11 there; 13 here).

    engine="native" (the resolution of "auto") serializes with zero
    optional dependencies: the jaxpr of the fused inference forward is
    mapped op-for-op to ONNX-13 and written through protobuf bindings
    generated from the transcribed public schema (see onnx/export.py).
    Output is decoded (bs, N, no) predictions, per-stride raw maps with
    raw_heads=True (the reference cpp/export.py contract), or — with
    include_postprocess=True — the full --export-nms equivalent
    (reference models/export.py:78-132, NMS_Export
    models/common.py:543-568): decode + ONNX `NonMaxSuppression`
    emitted as standard ops, outputs boxes/scores/classes/extras/
    batch_index with a dynamic detection count.

    engine="tf2onnx" uses the jax2tf -> tf2onnx bridge instead
    (fixed-capacity postprocess variant); it requires the optional
    `tf2onnx` + `onnx` packages (absent from the frozen TPU image).
    Postprocess-fused export is off by default either way — ONNX
    consumers usually attach their own NMS, matching the reference
    default (--export-nms opt-in).

    qparams (from models/quant.quantize_model or
    FaceDetector.calibrate_int8) switches the native engine to the
    W8A8 int8 graph: int8 initializers + ConvInteger bodies, the
    interchange analogue of the reference's int8-capable ncnn
    deployment (cpp/yolov7-face-ncnn)."""
    if engine == "auto":
        engine = "native"
    if engine == "native":
        if opset != 13:
            raise ValueError(
                f"native ONNX export emits opset 13 only (got {opset}); "
                "use engine='tf2onnx' for other opsets")
        from face_detection_multi_scale_tpu.onnx.export import (
            export_onnx_native, export_onnx_native_fused,
            export_onnx_native_quant)

        if qparams is not None:
            export_onnx_native_quant(
                spec, qparams, path, img_size=img_size, batch=batch,
                raw_heads=raw_heads,
                include_postprocess=include_postprocess,
                conf_thres=conf_thres, iou_thres=iou_thres,
                max_det=max_det)
        elif include_postprocess:
            if raw_heads:
                raise ValueError(
                    "raw_heads and include_postprocess are mutually "
                    "exclusive (raw maps have no boxes to suppress)")
            export_onnx_native_fused(
                model, variables, spec, path, img_size=img_size,
                batch=batch, conf_thres=conf_thres,
                iou_thres=iou_thres, max_det=max_det)
        else:
            export_onnx_native(model, variables, spec, path,
                               img_size=img_size, batch=batch,
                               raw_heads=raw_heads)
        meta = {
            "model": spec.name, "img_size": img_size, "batch": batch,
            "include_postprocess": include_postprocess,
            "raw_heads": raw_heads,
            "nkpt": spec.nkpt, "nc": spec.nc,
            "strides": list(spec.strides), "opset": 13,
            "engine": "native",
            "quantize": "int8" if qparams is not None else None,
            "input": "uint8 NHWC RGB, network-input frame",
            "output": ("boxes,scores,classes,extras,batch_index "
                       "(dynamic K)" if include_postprocess
                       else "per-stride raw maps" if raw_heads
                       else "decoded (bs, N, no)"),
        }
        if include_postprocess:
            meta.update(conf_thres=conf_thres, iou_thres=iou_thres,
                        max_det=max_det)
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2)
        return path
    if qparams is not None:
        raise ValueError(
            "int8 (qparams) export is only supported by the native "
            "engine (the jax2tf bridge path exports the float graph)")
    if raw_heads:
        raise ValueError(
            "raw_heads is only supported by the native engine "
            "(the jax2tf bridge path exports the decoded graph)")
    try:
        import tf2onnx  # noqa: F401  (optional dependency)
    except ImportError as e:
        raise ImportError(
            "ONNX export needs the optional tf2onnx+onnx packages "
            "(pip install tf2onnx onnx). On TPU serving images, prefer "
            "--format stablehlo or savedmodel; convert to ONNX on a dev "
            "machine: python -m tf2onnx.convert --saved-model "
            "<savedmodel dir> --output model.onnx") from e
    import tensorflow as tf
    from jax.experimental import jax2tf

    fn = _build_fn(model, variables, spec,
                   include_postprocess=include_postprocess,
                   raw_heads=False, conf_thres=conf_thres,
                   iou_thres=iou_thres, max_det=max_det, dtype=dtype)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec((batch, img_size, img_size, 3),
                                       tf.uint8)],
        autograph=False)
    tf2onnx.convert.from_function(
        tf_fn,
        input_signature=[tf.TensorSpec((batch, img_size, img_size, 3),
                                       tf.uint8)],
        opset=opset, output_path=path)
    return path


def export_savedmodel(model, variables, spec, path: str, *,
                      img_size: int = 640, batch: int = 1,
                      include_postprocess: bool = True,
                      conf_thres: float = 0.25, iou_thres: float = 0.45,
                      max_det: int = 300, dtype=jnp.float32) -> str:
    """TF SavedModel via jax2tf for serving containers."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    fn = _build_fn(model, variables, spec,
                   include_postprocess=include_postprocess,
                   raw_heads=False, conf_thres=conf_thres,
                   iou_thres=iou_thres, max_det=max_det, dtype=dtype)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec((batch, img_size, img_size, 3),
                                       tf.uint8)],
        autograph=False)
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, path,
                        signatures={"serving_default": tf_fn})
    return path
