"""End-to-end smoke of the production batch-prediction CLI
(cli/batch_predict.py — the yolov7_face_multi_scale_dataframe_predict.py
surface): CSV -> frames -> multi-scale detect -> Triton-style JSON +
max-faces image, then idempotent resume (skip-processed)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    import cv2
    import pandas as pd

    root = tmp_path_factory.mktemp("corpus")
    base = root / "footage"
    rng = np.random.default_rng(0)
    rows = []
    for item in ("aaa", "bbb"):
        d = base / item
        d.mkdir(parents=True)
        for f in range(2):
            cv2.imwrite(str(d / f"7_original_{f}.jpg"),
                        rng.integers(0, 255, (120, 160, 3), np.uint8))
        rows.append({"item_id": item,
                     "path": f"{item}/7_original.jpg"})
    csv = root / "items.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return root, csv, base


def test_batch_predict_end_to_end_and_resume(corpus, capsys):
    root, csv, base = corpus
    out_dir = root / "json_out"
    faces_dir = root / "faces_out"

    from cli.batch_predict import main

    args = ["--csv", str(csv), "--base-path", str(base),
            "--output-dir", str(out_dir), "--max-faces-dir",
            str(faces_dir), "--model", "yolov7-lite-t",
            "--img-sizes", "128", "--conf-thres", "0.001",
            "--dtype", "float32", "--num-workers", "2"]
    assert main(args) == 0
    printed = capsys.readouterr().out
    assert "2 items" in printed

    jsons = sorted(out_dir.glob("*.json"))
    assert len(jsons) == 2
    payload = json.loads(jsons[0].read_text())
    names = {t["name"] for t in payload["yolo_face_prediction"]}
    assert {"yolo-face-bboxes", "yolo-face-confidence",
            "yolo-face-infer_time",
            "yolo-face-total_time"} <= names
    bb = next(t for t in payload["yolo_face_prediction"]
              if t["name"] == "yolo-face-bboxes")
    assert bb["shape"][0] == 2  # num frames

    # resume: everything already done -> progress reports done, and a
    # second run skips every item
    assert main(args + ["--check-progress"]) == 0
    assert "2 done" in capsys.readouterr().out
    assert main(args + ["--force-continue"]) == 0
    # outputs unchanged (no rewrite)
    assert sorted(out_dir.glob("*.json")) == jsons
