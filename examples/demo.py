#!/usr/bin/env python
"""End-to-end demo (the reference notebook's role,
demo/inference_for_yolov5.ipynb): load a model, run single- and
multi-scale detection on an image, draw, and export JSON."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np

    from face_detection_multi_scale_tpu import hub

    image = sys.argv[1] if len(sys.argv) > 1 else None
    weights = sys.argv[2] if len(sys.argv) > 2 else None

    det = hub.create("yolov7-tiny-face", weights=weights,
                     img_sizes=(640, 1280), conf_thres=0.25,
                     use_api_preprocess=True)
    if image is None:
        image = np.random.default_rng(0).integers(
            0, 255, (480, 640, 3), np.uint8)
        print("no image given; using random noise")

    rows, shape, seconds = det.detect_single_scale(image, 640)
    print(f"single-scale 640: {len(rows)} faces in {seconds * 1000:.1f} ms")

    final, shape = det.detect_multi_scale(image)
    print(f"multi-scale {det.img_sizes}: {len(final)} faces")

    det.save_detection_result(image, final, "demo_result.jpg")
    det.export_to_json(final, shape, "demo_result.json")
    print("wrote demo_result.jpg / demo_result.json")


if __name__ == "__main__":
    main()
