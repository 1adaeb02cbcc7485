"""Standalone native detector app vs the JAX pipeline on the same raw
head maps (the ncnn-app-analog parity check)."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu import native as N

pytestmark = pytest.mark.skipif(N.build_app() is None,
                                reason="native toolchain unavailable")


def test_native_app_matches_jax_pipeline(tmp_path):
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    x = jnp.asarray(np.random.default_rng(5).random((1, 128, 128, 3)),
                    jnp.float32)
    raws = model.apply(variables, x, train=False)

    # JAX path
    preds = decode(raws, spec)
    dets = NMS.non_max_suppression(preds, 0.1, 0.45, nc=1, nkpt=5,
                                   max_candidates=2048, max_det=300,
                                   backend="xla")
    rows = NMS.detections_to_numpy(dets)[0]
    want = rows[:, :5]

    # native path on the same raw maps
    raw_path = str(tmp_path / "heads.bin")
    N.dump_raw_heads(raw_path, [np.asarray(r) for r in raws], spec)
    got = N.run_native_detector(raw_path, 0.1, 0.45, 300)

    assert got.shape == want.shape
    np.testing.assert_allclose(got[:, :4], want[:, :4], atol=2e-2)
    np.testing.assert_allclose(got[:, 4], want[:, 4], atol=1e-4)
