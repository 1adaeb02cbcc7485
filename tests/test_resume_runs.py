"""Resume-scanner CLI (the utils/aws/resume.py equivalent): interrupted
runs are found by comparing the last checkpoint's epoch to opt.json, and
the regenerated train commands carry the original configuration."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cli.resume_runs as resume_runs  # noqa: E402


def _make_run(root, name, done_epoch, want_epochs, with_opt=True):
    w = root / name / "weights"
    w.mkdir(parents=True)
    (w / "last.meta.json").write_text(json.dumps({"epoch": done_epoch}))
    if with_opt:
        (root / name / "opt.json").write_text(json.dumps({
            "epochs": want_epochs, "model": "yolov7-lite-t",
            "data": "d.yaml", "hyp": "scratch.p6", "batch_size": 8,
            "img_size": 128, "kpt_label": 5}))


def test_find_interrupted_and_command(tmp_path, capsys):
    _make_run(tmp_path, "exp_done", done_epoch=9, want_epochs=10)
    _make_run(tmp_path, "exp_mid", done_epoch=3, want_epochs=10)
    _make_run(tmp_path, "exp_noopt", done_epoch=0, want_epochs=10,
              with_opt=False)

    runs = resume_runs.find_interrupted(str(tmp_path))
    assert [Path(r[0]).name for r in runs] == ["exp_mid"]
    run_dir, done, want, opt = runs[0]
    assert (done, want) == (4, 10)

    assert resume_runs.main(["--root", str(tmp_path),
                             "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "exp_mid (epoch 4/10)" in out
    assert "--resume" in out and "--batch-size 8" in out
    assert "--model yolov7-lite-t" in out


def test_no_interrupted_runs(tmp_path, capsys):
    assert resume_runs.main(["--root", str(tmp_path)]) == 0
    assert "no interrupted runs" in capsys.readouterr().out
