"""Standalone Detect / IDetect head variants and legacy hub graph support.

The reference fork's plain Detect/IDetect heads are UNCONSTRUCTIBLE dead
code: parse_model appends the channel list as the third positional arg
(models/yolo.py:511 `args.append([ch[x] for x in f])`), which lands in
Detect's `nkpt` slot, and the default `nkpt=None` makes `3*self.nkpt` a
TypeError (models/yolo.py:29-36) — so no cfg, hub or custom, can build
them there. Direct oracling is therefore impossible; instead we prove

1. the yolov3-tiny hub GRAPH (nn.MaxPool2d / nn.ZeroPad2d / nn.Upsample
   backbone) reaches full converted-weights decode parity when capped
   with the one constructible head (IKeypoint), and
2. our detect/idetect variants are exact reductions of the
   oracle-verified ikeypoint path: idetect with neutral implicit params
   (ia=0, im=1) emits identical maps to detect, and our full Detect-head
   yolov3-tiny builds, infers strides, decodes, and runs NMS end-to-end.
"""

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models.convert import convert_state_dict
from face_detection_multi_scale_tpu.models.head import DetectionHead, decode
from face_detection_multi_scale_tpu.models.model import (
    YoloFace, compute_strides, init_model)
from face_detection_multi_scale_tpu.models.spec import (
    load_spec, spec_from_yolo_yaml)

from oracle import import_reference, seeded_torch

ref = import_reference()

HUB_TINY = "/root/reference/models/hub/yolov3-tiny.yaml"


def test_yolov3_tiny_graph_parity_with_ikeypoint_cap():
    """Full hub backbone through both frameworks: same converted weights,
    same decoded rows (head swapped to the constructible IKeypoint)."""
    torch = seeded_torch(0)
    cfg = yaml.safe_load(open(HUB_TINY))
    cfg["nkpt"] = 5
    cfg["nc"] = 1  # the fork's IKeypoint decode hardcodes the nc==1
    # column split (x_det=[..., :6], models/yolo.py:276-277)
    cfg["head"][-1] = [[19, 15], 1, "IKeypoint",
                       ["nc", "anchors", "nkpt"]]
    m = ref("models.yolo").Model(cfg, ch=3).eval().float()
    sd = {k: v.clone() for k, v in m.state_dict().items()}

    spec = spec_from_yolo_yaml(cfg, "yolov3-tiny-ik")
    compute_strides(spec, 128)  # P4/P5 pyramid, not the default P3 start
    assert list(spec.strides) == [16, 32]
    model = YoloFace(spec=spec)
    variables = convert_state_dict(sd)
    rng = np.random.default_rng(0)
    x = rng.random((1, 128, 128, 3)).astype(np.float32)
    raws = model.apply(variables, x, train=False)
    got = np.asarray(decode(raws, spec))
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def _head_pyramid(rng):
    return [jnp.asarray(rng.random((1, 8, 8, 16)), jnp.float32),
            jnp.asarray(rng.random((1, 4, 4, 32)), jnp.float32)]


def test_idetect_with_neutral_implicits_equals_detect():
    cfg = yaml.safe_load(open(HUB_TINY))
    spec = spec_from_yolo_yaml(cfg, "v3t").resolve()
    rng = np.random.default_rng(1)
    xs = _head_pyramid(rng)

    det = DetectionHead(spec, "detect")
    v_det = det.init(jax.random.PRNGKey(0), xs)
    idet = DetectionHead(spec, "idetect")
    v_id = idet.init(jax.random.PRNGKey(0), xs)

    # graft the conv weights, neutralize the implicit knowledge
    p = jax.device_get(v_id["params"])
    for i in range(2):
        p[f"m_{i}"] = jax.device_get(v_det["params"][f"m_{i}"])
        p[f"ia_{i}"] = jax.tree.map(jnp.zeros_like, p[f"ia_{i}"])
        p[f"im_{i}"] = jax.tree.map(jnp.ones_like, p[f"im_{i}"])

    out_d = det.apply(v_det, xs)
    out_i = idet.apply({"params": p}, xs)
    for a, b in zip(out_d, out_i):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_detect_head_yolov3_tiny_end_to_end():
    """The untouched hub cfg (plain Detect, nkpt=0) builds and runs
    through init -> forward -> decode -> NMS in our framework."""
    from face_detection_multi_scale_tpu.ops import nms as NMS

    spec = load_spec(HUB_TINY)
    assert spec.nodes[-1].op == "Detect" and spec.nkpt == 0
    compute_strides(spec, 128)
    model, variables = init_model(spec, img_size=128)
    rspec = model.spec
    assert list(rspec.strides) == [16, 32]
    rng = np.random.default_rng(2)
    x = rng.random((2, 128, 128, 3)).astype(np.float32)
    raws = model.apply(variables, x, train=False)
    pred = decode(raws, rspec)
    n_rows = sum(rspec.na * (128 // s) ** 2 for s in rspec.strides)
    assert pred.shape == (2, n_rows, 5 + rspec.nc)
    assert bool(jnp.isfinite(pred).all())
    dets = NMS.non_max_suppression(pred, 0.25, 0.5, nc=rspec.nc, nkpt=0,
                                   max_candidates=256, max_det=20)
    rows = NMS.detections_to_numpy(dets)
    assert len(rows) == 2 and rows[0].shape[1] == 6
