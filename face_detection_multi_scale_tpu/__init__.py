"""TPU-native multi-scale face detection framework.

A from-scratch JAX/XLA/Pallas re-design of the YOLOv7-face multi-scale
detector (reference: NguyendaiAI-pixta/face_detection_multi_scale): anchor-based
face detection with 5-point facial landmarks, multi-scale TTA inference with
scale-aware weighted NMS, WIDER FACE training and evaluation, and a
production batch-prediction pipeline — built on statically-shaped compiled
executables, on-device NMS, and mesh-sharded data parallelism.
"""

__version__ = "0.1.0"
