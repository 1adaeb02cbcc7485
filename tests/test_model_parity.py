"""End-to-end model parity: reference torch Model (random init) vs our
flax graph with converted weights, on the same input."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.models.convert import (
    assert_tree_shapes_match, convert_state_dict)
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.models.spec import load_spec

from oracle import import_reference, seeded_torch

ref = import_reference()

CFG_DIR = "/root/reference/cfg"


def build_reference(cfg_name, imgsz):
    torch = seeded_torch(0)
    Model = ref("models.yolo").Model
    model = Model(f"{CFG_DIR}/{cfg_name}.yaml", ch=3)
    model.eval()
    x = torch.rand(1, 3, imgsz, imgsz)
    with torch.no_grad():
        z, raw = model(x)
    return model, x, z, raw


def run_ours(cfg_name, torch_model, x_torch):
    spec = load_spec(f"{CFG_DIR}/{cfg_name}.yaml", cfg_name)
    model, variables = init_model(spec, img_size=64)
    converted = convert_state_dict(torch_model.state_dict())
    assert_tree_shapes_match(converted["params"], variables["params"].unfreeze()
                             if hasattr(variables["params"], "unfreeze")
                             else dict(variables["params"]))
    images = np.asarray(x_torch.numpy()).transpose(0, 2, 3, 1)  # NCHW->NHWC
    raws = model.apply(converted, images, train=False)
    z = decode(raws, spec)
    return np.asarray(z), [np.asarray(r) for r in raws], spec


@pytest.mark.parametrize("cfg,imgsz,tol", [
    ("yolov7-lite-t", 128, 2e-4),
    pytest.param("yolov7-tiny-face", 128, 2e-4, marks=pytest.mark.slow),
    pytest.param("yolov7s-face", 128, 5e-4, marks=pytest.mark.slow),
    pytest.param("yolov7-face", 128, 5e-4, marks=pytest.mark.slow),
    pytest.param("yolov7-lite-s", 128, 2e-4, marks=pytest.mark.slow),
])
def test_model_parity_small(cfg, imgsz, tol):
    torch_model, x, z_ref, raw_ref = build_reference(cfg, imgsz)
    z_ours, raws_ours, spec = run_ours(cfg, torch_model, x)

    # raw per-level maps (training contract) match
    for lvl, (r_ref, r_ours) in enumerate(zip(raw_ref, raws_ours)):
        np.testing.assert_allclose(
            r_ours, r_ref.numpy(), atol=tol, rtol=1e-3,
            err_msg=f"level {lvl} raw map mismatch")
    # decoded predictions match
    np.testing.assert_allclose(z_ours, z_ref.numpy(), atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_model_parity_w6():
    torch_model, x, z_ref, raw_ref = build_reference("yolov7-w6", 128)
    z_ours, raws_ours, spec = run_ours("yolov7-w6", torch_model, x)
    assert spec.strides == (8, 16, 32, 64)
    for r_ref, r_ours in zip(raw_ref, raws_ours):
        np.testing.assert_allclose(r_ours, r_ref.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(z_ours, z_ref.numpy(), atol=1e-2, rtol=1e-3)


def test_param_count_matches_reference():
    torch_model, _, _, _ = build_reference("yolov7-lite-t", 64)
    n_torch = sum(p.numel() for p in torch_model.parameters())
    spec = load_spec(f"{CFG_DIR}/yolov7-lite-t.yaml")
    import jax
    _, variables = init_model(spec, img_size=64)
    n_ours = sum(int(np.prod(p.shape))
                 for p in jax.tree.leaves(variables["params"]))
    assert n_ours == n_torch
