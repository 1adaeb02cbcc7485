"""Spatial sharding of one image's H x W plane across the mesh — the
giant-pyramid-scale path (reference multi_scale_face_detector.py:33 runs
a 3840x3840 forward on one GPU; on TPU the plane shards over chips and
XLA GSPMD inserts conv halo exchanges automatically). Verified on the
8-device virtual CPU mesh: sharded forward == single-device forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.ops import nms as NMS
from face_detection_multi_scale_tpu.parallel.mesh import (
    make_spatial_mesh, spatial_infer)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def test_spatial_sharded_forward_matches_single_device():
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    rng = np.random.default_rng(0)
    # 256px stands in for the 3840 scale; 4x2 mesh shards it 64x128/chip
    x = rng.integers(0, 255, (1, 256, 256, 3), np.uint8)

    want = np.asarray(decode(model.apply(
        variables, jnp.asarray(x, jnp.float32) / 255.0, train=False),
        model.spec))

    mesh = make_spatial_mesh(jax.devices()[:8])
    assert mesh.devices.shape in ((2, 4), (4, 2))
    got = np.asarray(spatial_infer(model, variables, x, mesh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_spatial_sharded_with_fused_postprocess():
    """The NMS rides inside the same jit: candidates gather implicitly,
    suppression runs on device, keepers match the single-device path."""
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, (1, 256, 256, 3), np.uint8)

    def post(preds):
        return NMS.non_max_suppression(
            preds, 0.001, 0.5, nc=spec.nc, nkpt=spec.nkpt,
            max_candidates=512, max_det=50)

    ref_dets = post(decode(model.apply(
        variables, jnp.asarray(x, jnp.float32) / 255.0, train=False),
        model.spec))
    want = NMS.detections_to_numpy(ref_dets)[0]

    mesh = make_spatial_mesh(jax.devices()[:8])
    got_dets = spatial_infer(model, variables, x, mesh, postprocess=post)
    got = NMS.detections_to_numpy(
        jax.tree.map(jax.device_get, got_dets))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:, :4], want[:, :4], atol=1e-3)
    np.testing.assert_allclose(got[:, 4], want[:, 4], atol=1e-4)
