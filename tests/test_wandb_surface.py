"""Experiment-tracker (W&B) surface: resume-by-id plumbing and artifact
versioning (the load-bearing subset of the reference's
utils/wandb_logging/wandb_utils.py:42-53, 127-158, 201-215), exercised
against an injected fake wandb module — the real package is optional and
absent in this environment. The artifact-*download* machinery
(dataset-as-artifact training) is explicitly descoped; see README."""

import json
import sys
import types

import numpy as np

from face_detection_multi_scale_tpu.train.checkpoint import peek_meta
from face_detection_multi_scale_tpu.utils.profiling import MetricsLogger


class FakeRun:
    def __init__(self, run_id):
        self.id = run_id
        self.logged = []
        self.artifacts = []

    def log(self, metrics, step=None):
        self.logged.append((step, metrics))

    def log_artifact(self, art):
        self.artifacts.append(art)


class FakeArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata
        self.files = []

    def add_file(self, path):
        self.files.append(path)


def install_fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    calls = {}

    def init(**kw):
        calls["init"] = kw
        return FakeRun(kw.get("id") or "generated-id-123")

    mod.init = init
    mod.Artifact = FakeArtifact
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return calls


def test_new_run_and_artifact(tmp_path, monkeypatch):
    calls = install_fake_wandb(monkeypatch)
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False,
                       use_wandb=True, config={"lr0": 0.01})
    assert calls["init"]["project"] == "fdms-tpu"
    assert calls["init"]["id"] is None
    assert calls["init"]["resume"] is None
    assert lg.run_id == "generated-id-123"

    lg.log(3, {"loss": 1.5, "skipme": "str"})
    assert lg.wandb.logged == [(3, {"loss": 1.5})]

    f = tmp_path / "weights.npz"
    np.savez(f, a=np.zeros(2))
    assert lg.log_artifact(f, "run_x_model", type="model",
                           metadata={"fitness": 0.5})
    art = lg.wandb.artifacts[0]
    assert art.name == "run_x_model" and art.type == "model"
    assert art.files == [str(f)] and art.metadata == {"fitness": 0.5}
    lg.close()


def test_resume_reattaches_run_id(tmp_path, monkeypatch):
    calls = install_fake_wandb(monkeypatch)
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False,
                       use_wandb=True, run_id="prev-run-77")
    assert calls["init"]["id"] == "prev-run-77"
    assert calls["init"]["resume"] == "allow"
    assert lg.run_id == "prev-run-77"
    lg.close()


def test_without_wandb_is_silent(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import fails
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False,
                       use_wandb=True)
    assert lg.wandb is None
    assert not lg.log_artifact(tmp_path / "x", "n")
    lg.log(0, {"loss": 1.0})  # JSONL still written
    lg.close()
    line = json.loads(
        (tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert line == {"step": 0, "loss": 1.0}


def test_peek_meta_round_trip(tmp_path):
    """The checkpoint metadata sidecar carries the tracker run id across
    restarts (check_wandb_resume equivalent, wandb_utils.py:42-53)."""
    (tmp_path / "last.meta.json").write_text(
        json.dumps({"epoch": 4, "wandb_id": "abc"}))
    meta = peek_meta(str(tmp_path), "last")
    assert meta == {"epoch": 4, "wandb_id": "abc"}
    assert peek_meta(str(tmp_path), "best") == {}
