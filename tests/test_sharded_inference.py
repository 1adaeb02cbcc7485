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

    rng = np.random.default_rng(1)
    for bs in (12, 9):  # 12: three chunks; 9: fallback (9 % 4 != 0)
        batch = rng.integers(0, 255, (bs, 64, 64, 3), np.uint8)
        want = detections_to_numpy(plain.run_network(batch))
        got = detections_to_numpy(micro.run_network(batch))
        assert len(got) == len(want) == bs
        for g, w in zip(got, want):
            assert g.shape == w.shape
            np.testing.assert_allclose(g, w, atol=1e-4)
