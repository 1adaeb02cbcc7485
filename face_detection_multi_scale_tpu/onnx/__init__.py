"""Native ONNX interchange: schema bindings, jaxpr->ONNX exporter, and
a numpy executor for round-trip testing (no onnx/tf2onnx/onnxruntime
dependencies — see export.py for the design rationale and the
reference parity anchors)."""

from face_detection_multi_scale_tpu.onnx import onnx_pb2  # noqa: F401
