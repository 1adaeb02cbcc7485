"""Pallas NMS kernel (interpret mode on CPU) vs the jnp matrix fixpoint
and the sequential greedy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from face_detection_multi_scale_tpu.ops import nms as N
from face_detection_multi_scale_tpu.ops.pallas_nms import nms_keep_pallas


def sorted_candidates(b, k, seed, frac_valid=1.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 600, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(5, 150, (b, k, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = np.sort(rng.uniform(0, 1, (b, k)).astype(np.float32))[:, ::-1]
    valid = np.zeros((b, k), bool)
    nv = int(k * frac_valid)
    valid[:, :nv] = True
    return boxes, np.ascontiguousarray(scores), valid


@pytest.mark.parametrize("b,k,thr", [(2, 1024, 0.5), (1, 2048, 0.3),
                                     (3, 1024, 0.7)])
def test_pallas_matches_matrix(b, k, thr):
    boxes, scores, valid = sorted_candidates(b, k, seed=k)
    keep = np.asarray(nms_keep_pallas(jnp.asarray(boxes),
                                      jnp.asarray(valid), thr,
                                      interpret=True))
    for i in range(b):
        idx, v = N.nms_keep_matrix(boxes[i], np.where(
            valid[i], scores[i], N.NEG_INF), thr, max_det=k)
        want = np.zeros(k, bool)
        want[np.asarray(idx)[np.asarray(v)]] = True
        np.testing.assert_array_equal(keep[i], want,
                                      err_msg=f"batch {i}")


def test_pallas_invalid_tail():
    boxes, scores, valid = sorted_candidates(1, 1024, seed=7,
                                             frac_valid=0.5)
    keep = np.asarray(nms_keep_pallas(jnp.asarray(boxes),
                                      jnp.asarray(valid), 0.5,
                                      interpret=True))[0]
    assert not keep[512:].any()  # invalid rows never kept
    assert keep[:512].any()


@pytest.mark.parametrize("b,k,thr,frac", [
    (2, 1024, 0.5, 1.0), (1, 2048, 0.3, 1.0), (3, 1024, 0.7, 1.0),
    (1, 1024, 0.5, 0.4),  # invalid tail crosses tile boundaries
    (1, 1024, 0.9, 1.0),  # long suppression chains
])
def test_seq_kernel_matches_fixpoint(b, k, thr, frac):
    """The round-3 tile-sequential kernel == the round-2 fixpoint kernel
    == the greedy matrix oracle, bit for bit."""
    boxes, scores, valid = sorted_candidates(b, k, seed=k + 13,
                                             frac_valid=frac)
    keep_seq = np.asarray(nms_keep_pallas(
        jnp.asarray(boxes), jnp.asarray(valid), thr, interpret=True,
        kernel_version="seq"))
    keep_fix = np.asarray(nms_keep_pallas(
        jnp.asarray(boxes), jnp.asarray(valid), thr, interpret=True,
        kernel_version="fixpoint"))
    np.testing.assert_array_equal(keep_seq, keep_fix)
    for i in range(b):
        idx, v = N.nms_keep_matrix(boxes[i], np.where(
            valid[i], scores[i], N.NEG_INF), thr, max_det=k)
        want = np.zeros(k, bool)
        want[np.asarray(idx)[np.asarray(v)]] = True
        np.testing.assert_array_equal(keep_seq[i], want,
                                      err_msg=f"batch {i}")


def test_mosaic_simulator_seq_kernel():
    """The serving NMS kernel under the Mosaic SIMULATOR
    (pltpu.InterpretParams): sequential-grid semantics, bool->i32
    while-loop carries, NaN-poisoned uninitialized memory — closer to
    the real lowering than plain interpret."""
    from jax.experimental.pallas import tpu as pltpu

    interp = pltpu.InterpretParams(
        detect_races=True, out_of_bounds_reads="raise",
        uninitialized_memory="nan")
    boxes, scores, valid = sorted_candidates(2, 1024, seed=29,
                                             frac_valid=0.7)
    for kv in ("seq", "fixpoint"):
        keep = np.asarray(nms_keep_pallas(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5,
            interpret=interp, kernel_version=kv))
        for i in range(2):
            idx, v = N.nms_keep_matrix(boxes[i], np.where(
                valid[i], scores[i], N.NEG_INF), 0.5, max_det=1024)
            want = np.zeros(1024, bool)
            want[np.asarray(idx)[np.asarray(v)]] = True
            np.testing.assert_array_equal(keep[i], want,
                                          err_msg=f"{kv} batch {i}")
