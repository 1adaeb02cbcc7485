"""Fast planar postprocess (non_max_suppression_from_raws on conv-layout
heads) vs the standard decode() + non_max_suppression path."""

import numpy as np

import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.ops import nms as N


def test_fast_path_matches_standard():
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    x = jnp.asarray(np.random.default_rng(2).random((2, 128, 128, 3)),
                    jnp.float32)

    raws_conv = model.apply(variables, x, train=False, reshape_heads=False)
    raws_std = model.apply(variables, x, train=False)

    want = N.non_max_suppression(
        decode(raws_std, spec), 0.1, 0.45, nc=1, nkpt=5,
        max_candidates=1024, max_det=100, backend="xla")
    got = N.non_max_suppression_from_raws(
        raws_conv, spec, 0.1, 0.45, max_candidates=1024, max_det=100,
        backend="xla")

    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_allclose(np.asarray(got.boxes)[v],
                               np.asarray(want.boxes)[v], atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.scores)[v],
                               np.asarray(want.scores)[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.extras)[v],
                               np.asarray(want.extras)[v], atol=1e-3)
