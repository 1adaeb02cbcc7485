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
