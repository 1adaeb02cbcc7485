#!/usr/bin/env python
"""Training-step throughput benchmark: images/sec through the full jitted
train step (forward + loss + backward + 3-group SGD + EMA + BN-stat
update) on synthetic batches. Run on the real chip for the recorded
number, or with --smoke on CPU.

    python tools/train_bench.py [--model yolov7-tiny-face]
        [--img-size 640] [--batch 64] [--iters 10] [--smoke]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-tiny-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--faces-per-image", type=int, default=8)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--with-loader", action="store_true",
                    help="feed the step from the real augmenting "
                         "DataLoader (synthetic WIDER-layout images, "
                         "mosaic+perspective+HSV on) and report the "
                         "input-pipeline wait share")
    ap.add_argument("--loader-workers", type=int, default=8)
    ap.add_argument("--loader-mode", default="thread",
                    choices=["thread", "process"])
    ap.add_argument("--cache-images", action="store_true",
                    help="RAM-cache decoded images (reference --cache-images):\n"
                    "measured on this box, imread is 65%% of the per-item cost\n"
                    "(25.5 -> 9.5 ms/item with the cache)")
    ap.add_argument("--record", action="store_true",
                    help="append/refresh this point as a mode=train row "
                         "in BENCH_SWEEP.json (bench.py --sweep only "
                         "rewrites the inference rows; train rows are "
                         "recorded here so the published table keeps "
                         "both sides)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.model, args.img_size, args.batch, args.iters = \
            "yolov7-lite-t", 128, 2, 2

    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6
    from face_detection_multi_scale_tpu.train.targets import (
        build_targets_batched)
    from face_detection_multi_scale_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step)

    spec = zoo.get_spec(args.model)
    dtype = (jnp.bfloat16 if args.dtype == "bfloat16"
             else jnp.float32)
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    cfg = TrainConfig(epochs=10, steps_per_epoch=100,
                      batch_size=args.batch)
    state = jax.device_put(create_train_state(variables))
    step = make_train_step(model, cfg, HYP_SCRATCH_P6, args.img_size)

    rng = np.random.default_rng(0)
    grids = [(args.img_size // s, args.img_size // s)
             for s in spec.strides]

    def make_batch(seed):
        r = np.random.default_rng(seed)
        images = r.integers(0, 255, (args.batch, args.img_size,
                                     args.img_size, 3), np.uint8)
        rows = []
        for b in range(args.batch):
            n = args.faces_per_image
            rows.append(np.concatenate([
                np.full((n, 1), b), np.zeros((n, 1)),
                r.uniform(0.2, 0.8, (n, 2)), r.uniform(0.05, 0.3, (n, 2)),
                r.uniform(0.2, 0.8, (n, 10))], axis=1))
        labels = np.concatenate(rows).astype(np.float32)
        targets = build_targets_batched(labels, args.batch, spec, grids,
                                        anchor_t=4.0)
        return (jax.device_put(images),
                jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)),
                             targets))

    batches = [make_batch(i) for i in range(3)]
    jax.block_until_ready(batches)

    state, loss, _ = step(state, *batches[0])  # compile
    state, loss, _ = step(state, *batches[1])  # warm
    float(loss)

    if args.with_loader:
        # real input pipeline: synthetic WIDER-layout images through the
        # augmenting DataLoader (mosaic+perspective+HSV) + host-side
        # build_targets, overlapped with the device step; the wait share
        # is the fraction of wall time the device sat idle for input
        # (reference hot loop train.py:399-463)
        import tempfile

        import yaml

        from face_detection_multi_scale_tpu.data.dataset import (
            DataLoader, FaceDataset)
        from face_detection_multi_scale_tpu.data.synthetic import (
            make_synthetic_face_dataset)

        root = tempfile.mkdtemp(prefix="train_bench_")
        n_images = max(args.batch * (args.iters + 2), args.batch * 3)
        yaml_path = make_synthetic_face_dataset(
            root, n_images=n_images, img_size=args.img_size)
        with open(yaml_path) as f:
            train_dir = yaml.safe_load(f)["train"]
        hyp = dict(HYP_SCRATCH_P6)
        hyp.update(mosaic=1.0, translate=0.1, scale=0.5, fliplr=0.5,
                   hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
        ds = FaceDataset(train_dir, img_size=args.img_size, augment=True,
                         hyp=hyp, kpt_label=5, stride=spec.max_stride,
                         batch_size=args.batch,
                         cache_images=args.cache_images)
        loader = DataLoader(ds, args.batch, shuffle=True,
                            workers=args.loader_workers, prefetch=3,
                            mode=args.loader_mode)

        def feed():
            for images, labels, _, _ in loader:
                targets = build_targets_batched(
                    labels, args.batch, spec, grids, anchor_t=4.0)
                yield (jax.device_put(images),
                       jax.tree.map(
                           lambda x: jax.device_put(jnp.asarray(x)),
                           targets))

        gen = feed()
        next(gen)  # exclude loader spin-up from the measurement
        t0 = time.perf_counter()
        t_wait = 0.0
        n_steps = 0
        for _ in range(args.iters):
            tw = time.perf_counter()
            try:
                images_d, targets_d = next(gen)
            except StopIteration:
                break
            t_wait += time.perf_counter() - tw
            state, loss, _ = step(state, images_d, targets_d)
            n_steps += 1
        final = float(loss)
        dt = time.perf_counter() - t0
        ips = round(args.batch * n_steps / dt, 2)
        wait = round(t_wait / dt, 4)
        print(json.dumps({
            "metric": f"{args.model} {args.img_size}px TRAIN "
                      f"images/sec/chip (batch={args.batch}, "
                      f"{args.dtype}, real augmenting loader "
                      f"{args.loader_workers}w/{args.loader_mode} "
                      f"+ build_targets + "
                      f"fwd+bwd+SGD+EMA+BN)",
            "value": ips,
            "unit": "images/sec/chip",
            "input_wait_share": wait,
            "loss": round(final, 4)}))
        if args.record:
            record_row({
                "model": args.model, "img_size": args.img_size,
                "batch": args.batch, "dtype": args.dtype,
                "mode": "train+loader", "images_per_sec": ips,
                "input_wait_share": wait,
                "note": f"real augmenting DataLoader "
                        f"({args.loader_workers}w/{args.loader_mode}"
                        f"{', cached' if args.cache_images else ''}) + "
                        f"build_targets + full jitted step; host-bound "
                        f"on few-core VMs"})
        return 0

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, loss, _ = step(state, *batches[i % 3])
    final = float(loss)
    dt = time.perf_counter() - t0
    ips = round(args.batch * args.iters / dt, 2)
    print(json.dumps({
        "metric": f"{args.model} {args.img_size}px TRAIN images/sec/chip"
                  f" (batch={args.batch}, {args.dtype}, "
                  f"fwd+bwd+SGD+EMA+BN)",
        "value": ips,
        "unit": "images/sec/chip",
        "loss": round(final, 4)}))
    if args.record:
        record_row({
            "model": args.model, "img_size": args.img_size,
            "batch": args.batch, "dtype": args.dtype, "mode": "train",
            "images_per_sec": ips,
            "note": "full jitted step fwd+bwd+SGD+EMA+BN, "
                    "device-resident synthetic batches"})
    return 0


def record_row(row):
    """Append/refresh a train row in BENCH_SWEEP.json, keyed on the
    full operating point (model, img_size, batch, dtype, mode) so
    distinct batch sizes / dtypes coexist — bench.py --sweep preserves
    mode=train rows, so the train side of the published table is
    recorded from here."""
    p = Path(__file__).resolve().parent.parent / "BENCH_SWEEP.json"
    try:
        rows = json.loads(p.read_text())
    except FileNotFoundError:
        rows = []
    key_fields = ("model", "img_size", "batch", "dtype", "mode")
    key = tuple(row.get(k) for k in key_fields)
    rows = [r for r in rows
            if tuple(r.get(k) for k in key_fields) != key]
    rows.append(row)
    p.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    sys.exit(main())
