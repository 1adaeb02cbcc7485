#!/usr/bin/env python
"""Blur-robustness dataset generation CLI (equivalent surface to the
reference blur_dataset_generator.py __main__ flow)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--wider-path", required=True,
                    help="WIDER train root (images/ + labels/)")
    ap.add_argument("--output-dir", default="blur_dataset")
    ap.add_argument("--total-images", type=int, default=500)
    ap.add_argument("--min-face", type=int, default=32)
    ap.add_argument("--val-path", default=None,
                    help="also blur this val split")
    ap.add_argument("--val-blur-level", default="medium",
                    choices=["light", "medium", "heavy"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from face_detection_multi_scale_tpu.data.blur import BlurDatasetGenerator

    gen = BlurDatasetGenerator(args.wider_path, seed=args.seed)
    stats = gen.create_blur_dataset(args.total_images, args.output_dir,
                                    min_face=args.min_face)
    print(f"train blur set: {stats}")
    if args.val_path:
        n = gen.create_blur_val(args.val_path, args.output_dir,
                                args.val_blur_level)
        print(f"val blur set: {n} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
