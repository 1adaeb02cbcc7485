"""CLI smokes for the remaining entry points: export, resize-method
comparison, and WIDER annotation visualizer — each driven end-to-end on
synthetic inputs to prove the argparse surface and output files."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_export_cli_stablehlo(tmp_path, capsys, monkeypatch):
    import cli.export as export_cli

    out = tmp_path / "m.stablehlo"
    rc = export_cli.main(["--model", "yolov7-lite-t", "--img-size",
                          "128", "--output", str(out)])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 100_000
    assert Path(str(out) + ".json").exists()  # contract sidecar


def test_compare_resize_methods_cli(tmp_path):
    import cv2

    import cli.compare_resize_methods as crm

    img = tmp_path / "in.jpg"
    cv2.imwrite(str(img), np.random.default_rng(0).integers(
        0, 255, (100, 160, 3), np.uint8))
    out = tmp_path / "cmp.png"
    rc = crm.main(["--image", str(img), "--model", "yolov7-lite-t",
                   "--img-size", "128", "--conf-thres", "0.001",
                   "--out", str(out)])
    assert rc == 0 and out.exists()


@pytest.fixture()
def annot(tmp_path):
    import cv2

    images = tmp_path / "images"
    d = images / "0--Ev"
    d.mkdir(parents=True)
    cv2.imwrite(str(d / "a.jpg"), np.zeros((100, 120, 3), np.uint8))
    # 10-field rows: x y w h blur expr illum invalid occl pose
    (tmp_path / "gt.txt").write_text(
        "0--Ev/a.jpg\n2\n10 10 30 30 0 0 0 0 0 0\n"
        "50 20 20 25 1 0 0 0 1 0\n")
    return tmp_path


def test_visualize_widerface_cli(annot, tmp_path, capsys):
    import cli.visualize_widerface as vw

    rc = vw.main(["stats", "--annot", str(annot / "gt.txt")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2" in out  # two faces counted

    png = tmp_path / "vis.png"
    rc = vw.main(["show", "--annot", str(annot / "gt.txt"),
                  "--images", str(annot / "images"),
                  "--image", "0--Ev/a.jpg", "--out", str(png)])
    assert rc == 0 and png.exists()


@pytest.mark.slow
def test_train_evolve_mode(tmp_path):
    """cli/train.py --evolve: two generations of short runs feed the
    mutation ledger (reference train.py:674-754)."""
    import cv2
    import yaml

    import cli.train as train_cli

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_dataset import make_fake_widerface

    imgs = make_fake_widerface(tmp_path / "wf", n_images=4, seed=2)
    dy = tmp_path / "d.yaml"
    dy.write_text(yaml.dump({"train": imgs, "val": imgs, "nc": 1,
                             "names": ["face"]}))
    rc = train_cli.main([
        "--model", "yolov7-lite-t", "--data", str(dy),
        "--img-size", "128", "--batch-size", "2", "--epochs", "1",
        "--project", str(tmp_path / "runs"), "--name", "evo",
        "--exist-ok", "--no-tensorboard", "--noautoanchor",
        "--workers", "1", "--evolve", "2"])
    assert rc == 0
    ledger = tmp_path / "runs" / "evolve.txt"
    assert (tmp_path / "runs" / "hyp_evolved.json").exists()
    lines = [l for l in ledger.read_text().splitlines() if l.strip()]
    assert len(lines) == 2


def test_visualize_widerface_to_labels(annot, tmp_path):
    """to-labels: normalized [cls cx cy w h] + nkpt zero landmarks with
    the occlusion=2 sentinel columns (the data/test.py conversion)."""
    import cli.visualize_widerface as vw

    out = tmp_path / "labels"
    rc = vw.main(["to-labels", "--annot", str(annot / "gt.txt"),
                  "--images", str(annot / "images"),
                  "--out", str(out)])
    assert rc == 0
    txt = (out / "0--Ev" / "a.txt").read_text().strip().splitlines()
    assert len(txt) == 2
    row = [float(v) for v in txt[0].split()]
    # cls 0, normalized box, 5 landmark triplets with sentinel 2.0
    assert row[0] == 0 and len(row) == 5 + 15
    assert abs(row[1] - (10 + 30 / 2) / 120) < 1e-6
    assert abs(row[2] - (10 + 30 / 2) / 100) < 1e-6
    assert row[5::3] == [0.0] * 5 and row[7::3] == [2.0] * 5


def test_detect_cli_stream_source(tmp_path, monkeypatch):
    """`--source <list>.txt` dispatches to LoadStreams (reference
    detect.py:56-61): frames flow from the threaded grabber through the
    engine and out to per-stream mp4s + label txts."""
    import cv2

    import cli.detect as detect_cli

    vid = str(tmp_path / "cam.mp4")
    writer = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"),
                             10, (96, 64))
    rng = np.random.default_rng(0)
    for _ in range(12):
        writer.write(rng.integers(0, 255, (64, 96, 3), np.uint8))
    writer.release()
    lst = tmp_path / "streams.txt"
    lst.write_text(vid + "\n")

    assert detect_cli.is_stream_source(str(lst))
    assert detect_cli.is_stream_source("0")
    assert detect_cli.is_stream_source("rtsp://cam.local/live")
    assert not detect_cli.is_stream_source("images/")

    monkeypatch.chdir(tmp_path)
    rc = detect_cli.main([
        "--source", str(lst), "--model", "yolov7-lite-t",
        "--img-size", "64", "--max-frames", "2", "--save-txt",
        "--conf-thres", "0.0001", "--project", str(tmp_path / "runs")])
    assert rc == 0
    out = tmp_path / "runs" / "exp"
    assert (out / "stream0.mp4").exists()
