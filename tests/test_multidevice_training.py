"""Multi-device training correctness: the 8-device sharded train step is
numerically the same program as the 1-device step on the same global
batch — the property DDP gradient averaging provides in the reference
(train.py:428-429), which here falls out of jit-on-mesh (XLA inserts the
gradient psum and cross-replica BN reductions)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.model import init_model
from face_detection_multi_scale_tpu.parallel.mesh import (
    batch_sharding, make_data_mesh, replicated)
from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6
from face_detection_multi_scale_tpu.train.targets import (
    build_targets_batched)
from face_detection_multi_scale_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


def _batch(spec, B=8, S=64, seed=5):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (B, S, S, 3), np.uint8)
    rows = []
    for b in range(B):
        n = 2
        cxy = rng.uniform(0.3, 0.7, (n, 2))
        wh = rng.uniform(0.1, 0.3, (n, 2))
        kpt = rng.uniform(0.2, 0.8, (n, 10))
        rows.append(np.concatenate(
            [np.full((n, 1), b), np.zeros((n, 1)), cxy, wh, kpt], axis=1))
    labels = np.concatenate(rows).astype(np.float32)
    grids = [(S // s, S // s) for s in spec.strides]
    targets = build_targets_batched(labels, B, spec, grids,
                                    cap_per_image=32)
    return images, targets


def _run(n_steps, mesh=None):
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, jax.random.PRNGKey(0),
                                  img_size=64)
    cfg = TrainConfig(epochs=3, steps_per_epoch=4, batch_size=8,
                      min_warmup_steps=4)
    step = make_train_step(model, cfg, HYP_SCRATCH_P6, 64)
    state = create_train_state(variables)
    images, targets = _batch(spec)
    losses = []
    if mesh is None:
        x = jnp.asarray(images)
        t = jax.tree.map(jnp.asarray, targets)
        for _ in range(n_steps):
            state, loss, _ = step(state, x, t)
            losses.append(float(loss))
    else:
        with mesh:
            sh = batch_sharding(mesh)
            state = jax.device_put(state, replicated(mesh))
            x = jax.device_put(images, sh)
            t = jax.tree.map(
                lambda v: jax.device_put(jnp.asarray(v), sh), targets)
            for _ in range(n_steps):
                state, loss, _ = step(state, x, t)
                losses.append(float(loss))
    return losses, jax.tree.map(np.asarray, jax.device_get(state.params))


def test_sharded_step_matches_single_device():
    """Same init + same global batch: per-step losses and final params of
    the 8-way sharded step match the unsharded step. Tolerance is set by
    float32 reduction ORDER, not semantics: the sharded program sums
    gradients/BN statistics via cross-device psum trees while the
    unsharded one reduces in-device, so elementwise drift of ~1e-6 per
    step accumulates (observed max 6e-6 after 3 steps); anything beyond
    1e-4 would indicate a real semantic divergence (e.g. per-shard mean
    instead of global mean)."""
    losses_1, params_1 = _run(3)
    mesh = make_data_mesh(jax.devices()[:8])
    losses_8, params_8 = _run(3, mesh=mesh)
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(params_1)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(params_8)[0]
    assert len(flat1) == len(flat8)
    for (kp, p1), (_, p8) in zip(flat1, flat8):
        np.testing.assert_allclose(
            p8, p1, rtol=2e-3, atol=1e-4,
            err_msg=str(tuple(k.key for k in kp)))


def test_sharded_batchnorm_uses_global_statistics():
    """The sharded step's BN batch statistics reduce over the FULL global
    batch (SyncBN semantics, reference train.py:247-249): running stats
    after one sharded step equal the unsharded step's."""
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, jax.random.PRNGKey(1),
                                  img_size=64)
    cfg = TrainConfig(epochs=2, steps_per_epoch=2, batch_size=8,
                      min_warmup_steps=2)
    step = make_train_step(model, cfg, HYP_SCRATCH_P6, 64)
    images, targets = _batch(spec, seed=11)

    # the step donates its input state; each state needs its own buffers
    copy = lambda tree: jax.tree.map(lambda x: jnp.array(x, copy=True),
                                     tree)
    s1 = create_train_state(copy(variables))
    s1, _, _ = step(s1, jnp.asarray(images),
                    jax.tree.map(jnp.asarray, targets))
    stats_1 = jax.tree.map(np.asarray, jax.device_get(s1.batch_stats))

    mesh = make_data_mesh(jax.devices()[:8])
    with mesh:
        sh = batch_sharding(mesh)
        s8 = jax.device_put(create_train_state(copy(variables)),
                            replicated(mesh))
        s8, _, _ = step(s8, jax.device_put(images, sh), jax.tree.map(
            lambda v: jax.device_put(jnp.asarray(v), sh), targets))
    stats_8 = jax.tree.map(np.asarray, jax.device_get(s8.batch_stats))

    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(stats_1)[0],
            jax.tree_util.tree_flatten_with_path(stats_8)[0]):
        # reduction-order fp32 drift only (see note in the test above);
        # per-shard (non-sync) BN statistics would differ at O(1e-1)
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=1e-6,
            err_msg=str(tuple(k.key for k in kp)))
