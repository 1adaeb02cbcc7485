#!/usr/bin/env python
"""Deployment-consumer demo (the onnx_inference/ role in the reference,
onnx_inference/yolo_pose_onnx_inference.py): run detection from an
EXPORTED artifact only — no model code, no weights conversion — exactly
what a serving container would do with a StableHLO export.

    python examples/exported_inference.py [image.jpg] [model-name]

Exports the model (random weights unless you pass a checkpoint through
cli/export.py first), reloads the artifact, letterboxes the image on the
host, runs the serialized fused graph (network + decode + NMS baked in),
and draws boxes + 5-point landmarks.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np

    from face_detection_multi_scale_tpu.data import letterbox as LB
    from face_detection_multi_scale_tpu.export_model import (
        export_stablehlo, load_stablehlo)
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.utils.plotting import (
        draw_detections)

    image_path = sys.argv[1] if len(sys.argv) > 1 else None
    name = sys.argv[2] if len(sys.argv) > 2 else "yolov7-lite-t"
    img_size = 256

    # producer side (normally cli/export.py with real weights)
    spec = zoo.get_spec(name)
    model, variables = init_model(spec, img_size=64)
    artifact = Path(tempfile.mkdtemp()) / f"{name}.stablehlo"
    export_stablehlo(model, variables, spec, str(artifact),
                     img_size=img_size, batch=1)
    print(f"exported {artifact} ({artifact.stat().st_size/1e6:.1f} MB)")

    # consumer side: artifact only
    fn = load_stablehlo(str(artifact))
    if image_path:
        import cv2

        img0 = cv2.imread(image_path)
    else:
        rng = np.random.default_rng(0)
        img0 = np.full((480, 640, 3), 64, np.uint8)
        img0[160:320, 240:400] = rng.integers(128, 255, (160, 160, 3),
                                              np.uint8)
    lb, ratio, pad = LB.letterbox(img0, img_size, auto=False,
                                  scaleup=False)
    x = np.ascontiguousarray(lb[None, :, :, ::-1])  # BGR -> RGB NHWC
    boxes, scores, classes, extras, valid = (np.asarray(v) for v in
                                             fn(x))
    keep = valid[0]
    rows = np.concatenate(
        [boxes[0][keep], scores[0][keep, None], classes[0][keep, None],
         extras[0][keep]], axis=1).astype(np.float64)
    if len(rows):
        LB.scale_coords((img_size, img_size), rows[:, :4],
                        img0.shape[:2], ratio_pad=(ratio, pad))
        rows[:, 6:] = LB.scale_coords(
            (img_size, img_size), rows[:, 6:], img0.shape[:2],
            ratio_pad=(ratio, pad), kpt=True, step=3)
    print(f"{len(rows)} detections")
    draw_detections(img0, rows, nkpt=spec.nkpt)
    out = "exported_result.jpg"
    import cv2

    cv2.imwrite(out, img0)
    print(f"saved {out}")

    # Act 2 — the ONNX consumer (the reference's onnx_inference demo
    # shape): native dependency-free ONNX artifact, executed with the
    # repo's numpy runner standing in for onnxruntime, consumer-side
    # numpy postprocess. External ONNX runtimes attach their own NMS,
    # so the artifact carries decoded rows only.
    from face_detection_multi_scale_tpu.export_model import export_onnx
    from face_detection_multi_scale_tpu.onnx import runner

    onnx_path = str(artifact.with_suffix(".onnx"))
    export_onnx(model, variables, spec, onnx_path,
                img_size=img_size, batch=1)
    (pred,) = runner.run_onnx(onnx_path, {"images": x})
    obj = pred[0, :, 4]
    conf = obj * pred[0, :, 5]
    cand = np.where((obj > 0.25) & (conf > 0.25))[0]
    cand = cand[np.argsort(-conf[cand])]
    cxy, wh = pred[0, cand, :2], pred[0, cand, 2:4]
    bxyxy = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    keep_idx = []
    for i in range(len(cand)):  # consumer-side greedy NMS, numpy only
        bi = bxyxy[i]
        ok = True
        for j in keep_idx:
            bj = bxyxy[j]
            iw = max(0.0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            ih = max(0.0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = iw * ih
            union = ((bi[2] - bi[0]) * (bi[3] - bi[1]) +
                     (bj[2] - bj[0]) * (bj[3] - bj[1]) - inter)
            if union > 0 and inter / union > 0.45:
                ok = False
                break
        if ok:
            keep_idx.append(i)
    print(f"ONNX consumer path: {len(keep_idx)} detections "
          f"(fused-artifact path found {len(rows)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
