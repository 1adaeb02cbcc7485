"""Training-feature parity: --freeze-until layer freezing
(reference train.py:101-153) and image-weights resampling
(reference train.py:374-385, utils/general.py:250-274)."""

import numpy as np

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6
from face_detection_multi_scale_tpu.train.targets import (
    build_targets_batched)
from face_detection_multi_scale_tpu.train.trainer import (
    TrainConfig, _layer_index, create_train_state, freeze_summary,
    freeze_tree, make_train_step)
from face_detection_multi_scale_tpu.utils.general import (
    labels_to_class_weights, labels_to_image_weights)

from oracle import import_reference

ref = import_reference()


def _setup(freeze_until=None, B=2, S=128):
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (B, S, S, 3), np.uint8)
    labels = np.array([
        [0, 0, 0.3, 0.4, 0.2, 0.25] + [0.3, 0.4] * 5,
        [1, 0, 0.5, 0.5, 0.3, 0.3] + [0.5, 0.5] * 5,
    ], np.float32)
    grid_shapes = [(S // s, S // s) for s in spec.strides]
    targets = jax.tree.map(jnp.asarray, build_targets_batched(
        labels, B, spec, grid_shapes, cap_per_image=64))
    cfg = TrainConfig(epochs=10, steps_per_epoch=40, lr0=0.01,
                      warmup_epochs=0.5, min_warmup_steps=5,
                      batch_size=B, freeze_until=freeze_until)
    return model, variables, images, targets, cfg


def test_freeze_until_keeps_early_layers_fixed():
    """Params of graph nodes 0..N stay bit-identical through training
    steps while later layers move (train.py:101-146 semantics)."""
    N = 5
    model, variables, images, targets, cfg = _setup(freeze_until=N)
    init_params = jax.tree.map(lambda x: np.array(x), variables["params"])
    step = make_train_step(model, cfg, HYP_SCRATCH_P6, 128)
    state = create_train_state(variables)
    x = jnp.asarray(images)
    for _ in range(3):
        state, loss, _ = step(state, x, targets)

    flat0 = jax.tree_util.tree_flatten_with_path(init_params)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.array, state.params))[0]
    n_frozen_checked = n_moved = 0
    for (kp0, p0), (kp1, p1) in zip(flat0, flat1):
        path = tuple(k.key for k in kp0)
        li = _layer_index(path)
        if li is not None and li <= N:
            np.testing.assert_array_equal(p0, p1, err_msg=str(path))
            n_frozen_checked += 1
        elif p0.size > 1:
            if not np.array_equal(p0, p1):
                n_moved += 1
    assert n_frozen_checked > 0
    assert n_moved > 0  # unfrozen layers actually trained


def test_freeze_tree_and_summary_agree():
    _, variables, *_ = _setup()
    params = variables["params"]
    frz = freeze_tree(params, 3)
    n_frz = sum(p.size for p, f in zip(
        jax.tree.leaves(params), jax.tree.leaves(frz)) if f)
    n_all = sum(p.size for p in jax.tree.leaves(params))
    sfrz, strn, layers = freeze_summary(params, 3)
    assert sfrz == n_frz and sfrz + strn == n_all
    assert layers and max(layers) <= 3
    # freeze_until=None freezes nothing
    assert not any(jax.tree.leaves(freeze_tree(params, None)))
    assert freeze_summary(params, None)[0] == 0


def test_image_weight_functions_match_reference():
    """labels_to_class_weights / labels_to_image_weights vs the reference
    implementations (utils/general.py:250-274) on multi-class labels."""
    general = ref("utils.general")
    rng = np.random.default_rng(7)
    nc = 4
    labels = []
    for _ in range(20):
        n = rng.integers(0, 6)
        l = np.zeros((n, 5), np.float32)
        l[:, 0] = rng.integers(0, nc, n)
        l[:, 1:] = rng.uniform(0.2, 0.8, (n, 4))
        labels.append(l)
    # reference concatenates all labels; images with 0 rows contribute none
    want_cw = general.labels_to_class_weights(labels, nc=nc).numpy()
    got_cw = labels_to_class_weights(labels, nc=nc)
    np.testing.assert_allclose(got_cw, want_cw, rtol=1e-6)

    want_iw = general.labels_to_image_weights(
        [l for l in labels if len(l)], nc=nc, class_weights=want_cw)
    got_iw = labels_to_image_weights(
        [l for l in labels if len(l)], nc=nc, class_weights=got_cw)
    np.testing.assert_allclose(got_iw, want_iw, rtol=1e-6)


def test_dataset_indices_indirection(tmp_path):
    """Rewriting dataset.indices changes which sample get() returns —
    the hook image-weights resampling uses (utils/datasets.py:551)."""
    import cv2

    from face_detection_multi_scale_tpu.data.dataset import FaceDataset

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i, shade in enumerate([40, 200]):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    np.full((64, 64, 3), shade, np.uint8))
        (lbl_dir / f"im{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.4 " + " ".join(["0.5 0.5 2"] * 5) + "\n")
    ds = FaceDataset(str(img_dir), img_size=64, augment=False,
                     kpt_label=5)
    img0, *_ = ds.get(0)
    ds.indices = [1, 0]
    img0_swapped, *_ = ds.get(0)
    assert img0.mean() < 100 < img0_swapped.mean()


def test_bf16_mixed_precision_train_step():
    """bf16-compute training (the AMP equivalent, train.py:364,425):
    params/optimizer state stay float32, the step runs, and the loss
    tracks the float32 step within bf16 precision."""
    from face_detection_multi_scale_tpu.train.trainer import (
        create_train_state, make_train_step)

    spec = zoo.get_spec("yolov7-lite-t")
    rng = np.random.default_rng(3)
    B, S = 2, 128
    images = rng.integers(0, 255, (B, S, S, 3), np.uint8)
    labels = np.array([
        [0, 0, 0.3, 0.4, 0.2, 0.25] + [0.3, 0.4] * 5,
        [1, 0, 0.5, 0.5, 0.3, 0.3] + [0.5, 0.5] * 5,
    ], np.float32)
    grid_shapes = [(S // s, S // s) for s in spec.strides]
    targets = jax.tree.map(jnp.asarray, build_targets_batched(
        labels, B, spec, grid_shapes, cap_per_image=64))
    cfg = TrainConfig(epochs=4, steps_per_epoch=4, batch_size=B,
                      min_warmup_steps=2)

    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model, variables = init_model(spec, img_size=64, dtype=dtype)
        state = create_train_state(variables)
        step = make_train_step(model, cfg, HYP_SCRATCH_P6, S)
        # params stay float32 regardless of compute dtype
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(state.params))
        state, loss, comps = step(state, jnp.asarray(images), targets)
        assert np.isfinite(float(loss))
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(state.params))
        losses[dtype.__name__] = float(loss)
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.05)
