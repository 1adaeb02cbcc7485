#!/usr/bin/env python
"""End-to-end AP-protocol dress rehearsal on synthetic data.

Runs the complete loop the WIDER FACE workflow uses, with no external
data: generate a learnable synthetic face dataset -> train -> write
val-set predictions through cli/test_widerface.py (exact txt format) ->
synthesize the 4 ground-truth .mat files in the official structure ->
run the official evaluation protocol -> print Easy/Medium/Hard AP.

Easy/medium/hard keep lists mimic the WIDER semantics by face size:
easy = faces > 48 px, medium = > 32 px, hard = all faces.

Usage: python tools/synthetic_e2e.py --root /tmp/syn_e2e --epochs 200
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_gt_mats(val_images_dir: str, val_labels_dir: str, gt_dir: str):
    """Build wider_face_val.mat + easy/medium/hard keep-list mats in the
    structure the evaluation protocol reads
    (widerface_evaluate/evaluation.py:18-34)."""
    from scipy.io import savemat

    events = sorted(os.listdir(val_images_dir))
    event_list = np.empty((len(events), 1), object)
    file_list = np.empty((len(events), 1), object)
    facebox_list = np.empty((len(events), 1), object)
    keeps = {"easy": np.empty((len(events), 1), object),
             "medium": np.empty((len(events), 1), object),
             "hard": np.empty((len(events), 1), object)}
    thresholds = {"easy": 48.0, "medium": 32.0, "hard": 0.0}

    for ei, event in enumerate(events):
        img_files = sorted(
            f for f in os.listdir(os.path.join(val_images_dir, event))
            if f.endswith(".jpg"))
        names = np.empty((len(img_files), 1), object)
        boxes_col = np.empty((len(img_files), 1), object)
        keep_cols = {k: np.empty((len(img_files), 1), object)
                     for k in keeps}
        for fi, fname in enumerate(img_files):
            stem = os.path.splitext(fname)[0]
            # plain str: scipy savemat cells round-trip as string arrays,
            # matching the official mats' structure
            names[fi, 0] = stem
            import cv2

            img = cv2.imread(os.path.join(val_images_dir, event, fname))
            h, w = img.shape[:2]
            lbl = os.path.join(val_labels_dir, event, stem + ".txt")
            rows = []
            if os.path.exists(lbl):
                for line in open(lbl):
                    vals = [float(v) for v in line.split()]
                    cx, cy, bw, bh = vals[1:5]
                    rows.append([(cx - bw / 2) * w, (cy - bh / 2) * h,
                                 bw * w, bh * h])
            gt = np.array(rows, np.float64).reshape(-1, 4)
            boxes_col[fi, 0] = gt
            for setting, thr in thresholds.items():
                keep = np.where((gt[:, 2] >= thr) & (gt[:, 3] >= thr))[0]
                # 1-based indices like the official mats
                keep_cols[setting][fi, 0] = (keep + 1).reshape(-1, 1) \
                    .astype(np.int32)
        event_list[ei, 0] = event
        file_list[ei, 0] = names
        facebox_list[ei, 0] = boxes_col
        for k in keeps:
            keeps[k][ei, 0] = keep_cols[k]

    os.makedirs(gt_dir, exist_ok=True)
    savemat(os.path.join(gt_dir, "wider_face_val.mat"),
            {"face_bbx_list": facebox_list, "event_list": event_list,
             "file_list": file_list})
    for setting in ("easy", "medium", "hard"):
        savemat(os.path.join(gt_dir, f"wider_{setting}_val.mat"),
                {"gt_list": keeps[setting]})
    return gt_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    choices=[None, "cpu", "tpu"],
                    help="force the jax platform (the JAX_PLATFORMS env "
                         "var is ignored on this machine's sitecustomize;"
                         " only the config update works)")
    ap.add_argument("--root", default="/tmp/syn_e2e")
    ap.add_argument("--model", default="yolov7-lite-t")
    ap.add_argument("--n-images", type=int, default=256)
    ap.add_argument("--img-size", type=int, default=160)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing weights in <root>/runs")
    ap.add_argument("--preprocess", default="host",
                    choices=["host", "device", "both"],
                    help="'device' fuses letterbox+normalize into the "
                         "network executable (infer/device_preprocess.py,"
                         " <=2/255 per-pixel difference vs cv2); 'both' "
                         "evaluates the two pipelines on the same "
                         "weights and prints the AP delta")
    ap.add_argument("--quant-ab", action="store_true",
                    help="also evaluate W8A8 int8 serving "
                         "(cli/test_widerface.py --quantize) on the same "
                         "weights and print the int8 AP delta vs float")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from face_detection_multi_scale_tpu.data.synthetic import (
        make_synthetic_face_dataset)
    root = Path(args.root)
    data_yaml = root / "data.yaml"
    if not data_yaml.exists():
        make_synthetic_face_dataset(str(root), n_images=args.n_images,
                                    img_size=args.img_size,
                                    val_fraction=0.15)
    print(f"dataset at {root}")

    weights = root / "runs" / "exp" / "weights" / "best_inference.npz"
    if args.skip_train and not weights.exists():
        # a training run that died before finalize leaves orbax last/best
        # but no stripped npz; recover it instead of silently RETRAINING
        # from scratch (which would clobber the good checkpoint)
        ckpt = root / "runs" / "exp" / "weights" / "best"
        if not ckpt.exists():
            ckpt = root / "runs" / "exp" / "weights" / "last"
        if ckpt.exists():
            print(f"stripping {ckpt} -> {weights}")
            from face_detection_multi_scale_tpu.models import zoo
            from face_detection_multi_scale_tpu.models.model import (
                init_model)
            from face_detection_multi_scale_tpu.train import (
                checkpoint as CKPT)
            from face_detection_multi_scale_tpu.train.trainer import (
                create_train_state)

            spec = zoo.get_spec(args.model)
            _, variables = init_model(spec, img_size=64)
            template = create_train_state(variables)
            state, _ = CKPT.load_checkpoint(str(ckpt.parent), ckpt.name,
                                            template)
            CKPT.save_inference_weights(
                str(weights), CKPT.strip_to_inference(state))
        else:
            raise SystemExit(
                f"--skip-train but no weights under {ckpt.parent}")
    if not args.skip_train:
        from cli.train import main as train_main

        train_main([
            "--model", args.model, "--data", str(data_yaml),
            "--hyp", "scratch.tiny", "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size),
            "--nominal-batch", str(args.batch_size),
            "--img-size", str(args.img_size),
            "--project", str(root / "runs"), "--name", "exp",
            "--exist-ok", "--noautoanchor", "--cache-images",
            "--log-interval", "10000", "--min-warmup-steps", "100",
            "--no-tensorboard"])

    # val list file (test_widerface reads <dataset>/../wider_val.txt)
    val_images = root / "val" / "images"
    entries = []
    for event in sorted(os.listdir(val_images)):
        for f in sorted(os.listdir(val_images / event)):
            if f.endswith(".jpg"):
                entries.append(f"{event}/{f}")
    with open(root / "val" / "wider_val.txt", "w") as f:
        f.write("\n".join(entries) + "\n")

    from cli.test_widerface import main as tw_main

    gt_dir = write_gt_mats(str(val_images), str(root / "val" / "labels"),
                           str(root / "gt"))

    from face_detection_multi_scale_tpu.eval.widerface import evaluation

    modes = (["host", "device"] if args.preprocess == "both"
             else [args.preprocess])
    variants = [(m, ["--device-preprocess"] if m == "device" else [],
                 "pred_txt" if m == "host" else "pred_txt_dev")
                for m in modes]
    if args.quant_ab:
        variants.append(("int8", ["--quantize"], "pred_txt_int8"))
    results = {}
    for mode, extra, sub in variants:
        txt_dir = root / sub
        cmd = ["--model", args.model, "--weights", str(weights),
               "--img-size", str(args.img_size),
               "--conf-thres", "0.01", "--iou-thres", "0.5",
               "--batch-size", "16",
               "--dataset_folder", str(val_images) + "/",
               "--save_folder", str(txt_dir) + "/"] + extra
        tw_main(cmd)
        print(f"[{mode} preprocess]" if mode in ("host", "device")
              else f"[{mode}]")
        results[mode] = evaluation(str(txt_dir), gt_dir)
    if "device" in results and "host" in results:
        delta = {k: results["device"][k] - results["host"][k]
                 for k in ("easy", "medium", "hard")}
        print("AP delta (device - host): "
              + " ".join(f"{k}={d:+.5f}" for k, d in delta.items()))
    if "int8" in results:
        base = results.get("host", results.get("device"))
        delta = {k: results["int8"][k] - base[k]
                 for k in ("easy", "medium", "hard")}
        print("AP delta (int8 - float): "
              + " ".join(f"{k}={d:+.5f}" for k, d in delta.items()))
    return results[variants[-1][0]]


if __name__ == "__main__":
    main()
