"""Loss parity: host target builder + device loss vs reference
ComputeLoss/build_targets on random predictions and labels."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6
from face_detection_multi_scale_tpu.train.loss import compute_loss
from face_detection_multi_scale_tpu.train.targets import (
    build_targets, targets_to_arrays)
from face_detection_multi_scale_tpu.models.spec import load_spec

from oracle import import_reference, seeded_torch

ref = import_reference()

CFG = "/root/reference/cfg/yolov7-lite-t.yaml"


def make_labels(rng, bs, n_per_img, nkpt=5):
    rows = []
    for b in range(bs):
        n = rng.integers(1, n_per_img + 1)
        xy = rng.uniform(0.2, 0.8, (n, 2))
        wh = rng.uniform(0.02, 0.3, (n, 2))
        kpts = rng.uniform(0.1, 0.9, (n, 2 * nkpt))
        # some keypoints zeroed (invisible)
        kpts[rng.uniform(size=kpts.shape) < 0.2] = 0.0
        img_cls = np.concatenate(
            [np.full((n, 1), b), np.zeros((n, 1))], axis=1)
        rows.append(np.concatenate([img_cls, xy, wh, kpts], axis=1))
    return np.concatenate(rows).astype(np.float32)


@pytest.fixture(scope="module")
def reference_setup():
    torch = seeded_torch(0)
    Model = ref("models.yolo").Model
    model = Model(CFG, ch=3)
    model.hyp = dict(HYP_SCRATCH_P6)
    model.gr = 1.0
    model.train()
    LossCls = ref("utils.loss").ComputeLoss
    loss_fn = LossCls(model, kpt_label=5)
    return torch, model, loss_fn


def test_loss_parity(reference_setup):
    torch, model, ref_loss = reference_setup
    rng = np.random.default_rng(3)
    bs, imgsz = 2, 128
    x = torch.from_numpy(
        rng.normal(size=(bs, 3, imgsz, imgsz)).astype(np.float32))
    with torch.no_grad():
        preds = model(x)  # training mode: list of raw maps
    labels = make_labels(rng, bs, 6)

    want_total, want_items = ref_loss(
        [p for p in preds], torch.from_numpy(labels))

    spec = load_spec(CFG)
    grid_shapes = [(p.shape[2], p.shape[3]) for p in preds]
    levels = build_targets(labels, spec, grid_shapes,
                           anchor_t=HYP_SCRATCH_P6["anchor_t"])
    raws = [p.numpy() for p in preds]
    got_total, got_items = compute_loss(
        raws, targets_to_arrays(levels), HYP_SCRATCH_P6,
        nc=spec.nc, nkpt=spec.nkpt, gr=1.0)

    np.testing.assert_allclose(np.asarray(got_items),
                               want_items.numpy(), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(got_total), float(want_total),
                               rtol=2e-4)


def test_build_targets_parity(reference_setup):
    torch, model, ref_loss = reference_setup
    rng = np.random.default_rng(7)
    bs, imgsz = 3, 128
    x = torch.from_numpy(
        rng.normal(size=(bs, 3, imgsz, imgsz)).astype(np.float32))
    with torch.no_grad():
        preds = model(x)
    labels = make_labels(rng, bs, 8)

    tcls, tbox, tkpt, indices, anch = ref_loss.build_targets(
        [p for p in preds], torch.from_numpy(labels))

    spec = load_spec(CFG)
    grid_shapes = [(p.shape[2], p.shape[3]) for p in preds]
    levels = build_targets(labels, spec, grid_shapes,
                           anchor_t=HYP_SCRATCH_P6["anchor_t"])

    for i, lt in enumerate(levels):
        m = lt.mask
        n_want = len(tcls[i])
        assert m.sum() == n_want, f"level {i} target count"
        b, a, gj, gi = [t.numpy() for t in indices[i]]
        np.testing.assert_array_equal(lt.b[m], b)
        np.testing.assert_array_equal(lt.a[m], a)
        np.testing.assert_array_equal(lt.gj[m], gj)
        np.testing.assert_array_equal(lt.gi[m], gi)
        np.testing.assert_allclose(lt.tbox[m], tbox[i].numpy(), atol=1e-5)
        np.testing.assert_allclose(lt.tkpt[m], tkpt[i].numpy(), atol=1e-5)
        np.testing.assert_allclose(lt.anchors[m], anch[i].numpy(), atol=1e-6)


def test_loss_zero_targets():
    """Empty label set: box/kpt losses zero, obj loss finite."""
    spec = load_spec(CFG)
    rng = np.random.default_rng(0)
    grid_shapes = [(16, 16), (8, 8), (4, 4)]
    raws = [rng.normal(size=(1, 3, ny, nx, 21)).astype(np.float32)
            for ny, nx in grid_shapes]
    labels = np.zeros((0, 16), np.float32)
    levels = build_targets(labels, spec, grid_shapes)
    total, items = compute_loss(raws, targets_to_arrays(levels),
                                HYP_SCRATCH_P6, nc=1, nkpt=5)
    assert np.isfinite(float(total))
    assert float(items[0]) == 0.0  # lbox
