#!/usr/bin/env python
"""WIDER FACE annotation browser / statistics CLI.

Equivalent surface to the reference visualize_widerface.py: parse the
10-field bbx_gt annotations, print dataset statistics by size/blur/
occlusion buckets, render single images with GT boxes, and convert
annotations to training labels (reference visualize_widerface.py:25-203,
data/test.py:10-20)."""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["stats", "show", "to-labels"])
    ap.add_argument("--annot", required=True,
                    help="wider_face_*_bbx_gt.txt path")
    ap.add_argument("--images", default=None, help="images root")
    ap.add_argument("--image", default=None,
                    help="relative image path for `show`")
    ap.add_argument("--out", default=None,
                    help="output png (show) / labels root (to-labels)")
    ap.add_argument("--skip-invalid", action="store_true")
    args = ap.parse_args(argv)

    from face_detection_multi_scale_tpu.data.widerface_annotations import (
        annotations_to_labels, dataset_statistics, load_annotations)

    annots = load_annotations(args.annot)

    if args.command == "stats":
        stats = dataset_statistics(annots)
        print(json.dumps(stats, indent=2, sort_keys=True))
    elif args.command == "show":
        assert args.images and args.image, "--images and --image required"
        import cv2

        from face_detection_multi_scale_tpu.utils.plotting import (
            draw_detection)

        img = cv2.imread(os.path.join(args.images, args.image))
        faces = annots.get(args.image, [])
        for face in faces:
            x, y, w, h = face["bbox"]
            label = (f"b{face['blur']} o{face['occlusion']}"
                     + (" INV" if face["invalid"] else ""))
            draw_detection(img, [x, y, x + w, y + h], label=label,
                           cls=face["blur"])
        out = args.out or "widerface_view.png"
        cv2.imwrite(out, img)
        print(f"{args.image}: {len(faces)} faces -> {out}")
    elif args.command == "to-labels":
        assert args.images and args.out, "--images and --out required"
        n = annotations_to_labels(annots, args.images, args.out,
                                  skip_invalid=args.skip_invalid)
        print(f"wrote {n} label files to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
