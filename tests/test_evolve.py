"""Hyperparameter evolution (reference train.py:674-754 +
utils/general.py:651-679 print_mutation): mutation meta bounds, ledger
persistence, fitness-weighted parent selection, end-to-end loop with a
stubbed trainer."""

import numpy as np

from face_detection_multi_scale_tpu.train.evolve import (
    META, append_ledger, evolve, mutate, read_ledger)
from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6


def test_meta_matches_reference_table():
    """Every evolvable key carries (gain, low, high) mirroring the
    reference meta dict (train.py:676-706)."""
    assert set(META) >= {"lr0", "lrf", "momentum", "weight_decay",
                         "box", "cls", "obj", "anchor_t", "scale",
                         "mosaic", "mixup", "fliplr", "hsv_h", "hsv_s",
                         "hsv_v", "translate", "degrees", "shear",
                         "perspective", "flipud", "iou_t", "cls_pw",
                         "obj_pw", "warmup_epochs", "warmup_momentum",
                         "warmup_bias_lr"}
    for k, (gain, lo, hi) in META.items():
        assert lo <= hi and gain >= 0, k


def test_mutation_respects_bounds_and_changes_something():
    hyp = dict(HYP_SCRATCH_P6)
    rng = np.random.default_rng(0)
    for _ in range(20):
        out = mutate(hyp, [], rng)
        changed = [k for k in META if k in hyp and out[k] != hyp[k]]
        assert changed  # the while-loop guarantees a real mutation
        for k in META:
            if k in out:
                assert META[k][1] <= out[k] <= META[k][2] or \
                    out[k] == hyp[k]


def test_ledger_roundtrip_and_parent_selection(tmp_path):
    path = str(tmp_path / "evolve.txt")
    hyp = dict(HYP_SCRATCH_P6)
    append_ledger(path, dict(hyp, lr0=0.9), 0.9, {"map50": 0.9})
    append_ledger(path, dict(hyp, lr0=0.001), 0.001, {"map50": 0.0})
    entries = read_ledger(path)
    assert len(entries) == 2 and entries[0]["fitness"] == 0.9
    # with an overwhelming fitness gap the parent is ~always the best
    rng = np.random.default_rng(1)
    import random

    random.seed(1)
    picked = [mutate(hyp, entries, rng)["lr0"] for _ in range(10)]
    # children of the lr0=0.9 parent stay near 0.9 (bounded by META)
    assert np.median(picked) > 0.05


def test_evolve_loop_keeps_best(tmp_path):
    path = str(tmp_path / "evolve.txt")
    calls = []

    def train_once(hyp):
        calls.append(hyp)
        fit = 1.0 - abs(hyp["lr0"] - 0.02)  # peak at lr0=0.02
        return fit, {"map50": fit}

    best = evolve(train_once, dict(HYP_SCRATCH_P6), generations=6,
                  ledger_path=path, seed=3)
    assert len(calls) == 6
    ledger = read_ledger(path)
    assert len(ledger) == 6
    best_fit = max(e["fitness"] for e in ledger)
    assert best == next(e["hyp"] for e in ledger
                        if e["fitness"] == best_fit)
