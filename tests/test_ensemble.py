"""Multi-checkpoint ensemble: candidate sets concatenate before one NMS
(the "nms ensemble", reference models/experimental.py:98-110), oracled
against the reference Ensemble forward with converted weights."""

import numpy as np

from face_detection_multi_scale_tpu.infer.detector import FaceDetector
from face_detection_multi_scale_tpu.infer.ensemble import EnsembleDetector
from face_detection_multi_scale_tpu.models.convert import convert_state_dict
from face_detection_multi_scale_tpu.ops import nms as NMS

from oracle import import_reference, seeded_torch

ref = import_reference()

CFGS = ["/root/reference/cfg/yolov7-lite-t.yaml",
        "/root/reference/cfg/yolov7-lite-s.yaml"]


def test_ensemble_candidates_match_reference():
    torch = seeded_torch(0)
    Model = ref("models.yolo").Model
    Ensemble = ref("models.experimental").Ensemble

    ens = Ensemble()
    dets = []
    for cfg in CFGS:
        m = Model(cfg, ch=3).eval().float()
        ens.append(m)
        variables = convert_state_dict(
            {k: v.clone() for k, v in m.state_dict().items()})
        dets.append(FaceDetector(
            cfg.split("/")[-1].replace(".yaml", ""),
            variables=variables, img_sizes=(128,), conf_thres=0.01,
            max_det=50, max_candidates=512, fuse=False))

    rng = np.random.default_rng(0)
    x = rng.random((2, 128, 128, 3)).astype(np.float32)
    u8 = (x * 255).astype(np.uint8)

    with torch.no_grad():
        want, _ = ens(torch.from_numpy(
            (u8.transpose(0, 3, 1, 2) / 255.0).astype(np.float32)))
    want = want.numpy()

    ensemble = EnsembleDetector(dets)
    # merged candidate rows equal the reference cat(y, 1) order
    import jax

    from face_detection_multi_scale_tpu.models.head import decode
    merged = np.concatenate([
        np.asarray(jax.jit(lambda v, xx, d=d: decode(
            d.model.apply(v, xx.astype(np.float32) / 255.0, train=False),
            d.spec))(d.variables, u8))
        for d in dets], axis=1)
    assert merged.shape == want.shape
    np.testing.assert_allclose(merged, want, rtol=2e-3, atol=2e-3)

    # and the shared NMS consumes the merged set
    out = ensemble.run_network(u8)
    rows = NMS.detections_to_numpy(out)
    assert len(rows) == 2
    assert all(r.shape[1] == 6 + 3 * dets[0].spec.nkpt for r in rows)
