#!/usr/bin/env python
"""Loader-only throughput A/B: serial vs thread-pool vs process-pool.

Measures the input pipeline in isolation (no device step): synthetic
WIDER-layout images through the augmenting FaceDataset + DataLoader,
identical work in every mode. Reports img/s per mode and img/s/core so
a many-core host's loader/device balance is predictable from this
1-core box (reference counterpart: torch DataLoader worker processes,
utils/datasets.py:59-121; worker count train.py:252-255).

    python tools/loader_bench.py --img-size 640 --batch 32 --batches 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(loader) -> dict:
    """Time a FULL epoch start-to-exhaustion, after a full warmup epoch.

    Timing a window that starts after the first yielded batch is wrong
    for pipelined loaders: with W batches in flight, the excluded
    'spin-up' absorbs up to W batches of compute and inflates the
    apparent rate (this exact bug produced a fake 4.5x process-mode
    'speedup' on a 1-core box in this file's first version)."""
    for _ in loader:  # warmup: pool fork, page cache, numpy imports
        pass
    t0 = time.perf_counter()
    n = 0
    for imgs, _, _, _ in loader:
        n += imgs.shape[0]
    dt = time.perf_counter() - t0
    return {"images_per_sec": round(n / dt, 2),
            "ms_per_image": round(1000 * dt / max(n, 1), 3),
            "epoch_images": n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, default=6,
                    help="measured batches per mode (one extra for "
                         "spin-up)")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--cache-images", action="store_true")
    args = ap.parse_args()

    import yaml

    from face_detection_multi_scale_tpu.data.dataset import (
        DataLoader, FaceDataset)
    from face_detection_multi_scale_tpu.data.synthetic import (
        make_synthetic_face_dataset)
    from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6

    root = tempfile.mkdtemp(prefix="loader_bench_")
    # sized so one epoch ~= args.batches batches after the val split
    n_images = int(args.batch * args.batches / 0.875) + 2
    yaml_path = make_synthetic_face_dataset(
        root, n_images=n_images, img_size=args.img_size)
    with open(yaml_path) as f:
        train_dir = yaml.safe_load(f)["train"]
    hyp = dict(HYP_SCRATCH_P6)
    hyp.update(mosaic=1.0, translate=0.1, scale=0.5, fliplr=0.5,
               hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    ds = FaceDataset(train_dir, img_size=args.img_size, augment=True,
                     hyp=hyp, kpt_label=5, stride=64,
                     batch_size=args.batch,
                     cache_images=args.cache_images)

    cores = len(os.sched_getaffinity(0))
    rows = []
    for mode, workers in [("serial", 1), ("thread", args.workers),
                          ("process", args.workers)]:
        loader = DataLoader(ds, args.batch, shuffle=True, seed=0,
                            workers=workers, prefetch=2,
                            mode=("process" if mode == "process"
                                  else "thread"))
        try:
            r = measure(loader)
        finally:
            loader.close()
        r.update(mode=mode, workers=workers,
                 images_per_sec_per_core=round(
                     r["images_per_sec"] / cores, 2))
        rows.append(r)
        print(json.dumps(r))

    print(json.dumps({
        "metric": f"loader-only img/s @{args.img_size}px "
                  f"(mosaic+perspective+HSV, {cores} core(s), "
                  f"cache_images={args.cache_images})",
        "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
