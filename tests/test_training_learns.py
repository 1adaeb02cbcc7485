"""Training sanity: the step normalizes uint8 batches and the loss drops
substantially when overfitting a fixed batch (catches sign/normalization
regressions end-to-end through model+loss+optimizer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6
from face_detection_multi_scale_tpu.train.targets import (
    build_targets_batched)
from face_detection_multi_scale_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)


def setup(seed=0, B=2, S=128):
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    rng = np.random.default_rng(seed)
    images_u8 = rng.integers(0, 255, (B, S, S, 3), np.uint8)
    labels = np.array([
        [0, 0, 0.3, 0.4, 0.2, 0.25] + [0.3, 0.4] * 5,
        [0, 0, 0.7, 0.6, 0.15, 0.2] + [0.7, 0.6] * 5,
        [1, 0, 0.5, 0.5, 0.3, 0.3] + [0.5, 0.5] * 5,
    ], np.float32)
    grid_shapes = [(S // s, S // s) for s in spec.strides]
    targets = jax.tree.map(jnp.asarray, build_targets_batched(
        labels, B, spec, grid_shapes, cap_per_image=64))
    hyp = dict(HYP_SCRATCH_P6, weight_decay=0.0)
    cfg = TrainConfig(epochs=10, steps_per_epoch=40, lr0=0.01,
                      warmup_epochs=0.5, min_warmup_steps=20,
                      batch_size=B)
    return model, variables, images_u8, targets, hyp, cfg


def test_uint8_step_matches_normalized_float_step():
    model, variables, images_u8, targets, hyp, cfg = setup()
    step = make_train_step(model, cfg, hyp, 128)
    # the step donates its input state, so each state needs its own
    # buffers (create_train_state shares the incoming params)
    copy = lambda tree: jax.tree.map(lambda x: jnp.array(x, copy=True),
                                     tree)
    s1 = create_train_state(copy(variables))
    s2 = create_train_state(copy(variables))
    _, loss_u8, _ = step(s1, jnp.asarray(images_u8), targets)
    _, loss_f32, _ = step(
        s2, jnp.asarray(images_u8, jnp.float32) / 255.0, targets)
    np.testing.assert_allclose(float(loss_u8), float(loss_f32), rtol=1e-5)


def test_loss_decreases_overfitting_fixed_batch():
    model, variables, images_u8, targets, hyp, cfg = setup()
    step = make_train_step(model, cfg, hyp, 128)
    state = create_train_state(variables)
    x = jnp.asarray(images_u8)
    losses = []
    for i in range(120):
        state, loss, comps = step(state, x, targets)
        losses.append(float(comps[5]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    # box loss specifically must shrink
    _, _, comps = step(state, x, targets)
    assert float(comps[0]) < 0.1


@pytest.mark.slow
def test_synthetic_faces_reach_nontrivial_map(tmp_path):
    """Full-stack learnability: train lite-t on drawn synthetic faces and
    require nontrivial held-out mAP50 (dataset -> aug -> targets -> loss
    -> optimizer -> EMA -> mAP protocol all working together)."""
    from face_detection_multi_scale_tpu.data.dataset import (
        DataLoader, FaceDataset)
    from face_detection_multi_scale_tpu.data.synthetic import (
        make_synthetic_face_dataset)
    from face_detection_multi_scale_tpu.infer.validate import validate

    import yaml

    data_yaml = make_synthetic_face_dataset(str(tmp_path / "syn"),
                                            n_images=32, img_size=128)
    with open(data_yaml) as f:
        data = yaml.safe_load(f)

    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    hyp = dict(HYP_SCRATCH_P6, weight_decay=0.0)
    ds = FaceDataset(data["train"], img_size=128, augment=True, hyp=hyp,
                     kpt_label=5, cache_images=True)
    loader = DataLoader(ds, 8, shuffle=True, seed=0)
    cfg = TrainConfig(epochs=20, steps_per_epoch=max(len(loader), 1),
                      lr0=0.01, warmup_epochs=1.0, min_warmup_steps=40,
                      batch_size=8)
    step = make_train_step(model, cfg, hyp, 128)
    state = create_train_state(variables)
    grid_shapes = [(128 // s, 128 // s) for s in spec.strides]
    for epoch in range(20):
        loader.set_epoch(epoch)
        for images, labels, paths, shapes in loader:
            targets = jax.tree.map(jnp.asarray, build_targets_batched(
                labels, len(images), spec, grid_shapes))
            state, loss, comps = step(state, jnp.asarray(images), targets)
    val_ds = FaceDataset(data["val"], img_size=128, augment=False, hyp={},
                         kpt_label=5)
    results = validate(model, {"params": state.ema_params,
                               "batch_stats": state.batch_stats},
                       val_ds, batch_size=4, verbose=False)
    assert results["map50"] > 0.02, results
