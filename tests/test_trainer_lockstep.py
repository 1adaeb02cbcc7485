"""Train-step lockstep oracle: identical converted weights + identical
batches through the reference training semantics (torch nesterov SGD with
3 param groups, per-iteration warmup, per-epoch cosine schedule, ramped
EMA — train.py:155-198, 395-442; utils/torch_utils.py:269-303) and through
trainer.py, asserting per-step losses and the resulting parameters track
each other. This converts 'training probably matches' into evidence."""

import numpy as np

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models.convert import (
    convert_state_dict)
from face_detection_multi_scale_tpu.models.model import YoloFace
from face_detection_multi_scale_tpu.models.spec import load_spec
from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P6
from face_detection_multi_scale_tpu.train.targets import (
    build_targets_batched)
from face_detection_multi_scale_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step, scale_loss_gains)

from oracle import import_reference, seeded_torch

ref = import_reference()

CFG = "/root/reference/cfg/yolov7-lite-t.yaml"
BS, IMGSZ = 2, 128
N_STEPS = 4
STEPS_PER_EPOCH = 2
EPOCHS = 4
NW = 2  # warmup iterations: steps 0-2 warm (ref: ni <= nw), step 3 cosine


def _make_batches(spec):
    rng = np.random.default_rng(21)
    batches = []
    for s in range(N_STEPS):
        images = rng.integers(0, 255, (BS, IMGSZ, IMGSZ, 3), np.uint8)
        rows = []
        for b in range(BS):
            n = int(rng.integers(1, 4))
            xy = rng.uniform(0.3, 0.7, (n, 2))
            wh = rng.uniform(0.08, 0.3, (n, 2))
            kpt = rng.uniform(0.2, 0.8, (n, 10))
            rows.append(np.concatenate(
                [np.full((n, 1), b), np.zeros((n, 1)), xy, wh, kpt],
                axis=1))
        labels = np.concatenate(rows).astype(np.float32)
        batches.append((images, labels))
    return batches


def _run_reference(batches, hyp_scaled):
    """The reference training semantics distilled from train.py:
    3-group SGD (155-189), LambdaLR cosine per epoch (192-198), warmup
    interp per iteration (406-414), loss*bs backward + EMA (425-442)."""
    torch = seeded_torch(0)
    import math

    import torch.nn as nn
    import torch.optim as optim

    Model = ref("models.yolo").Model
    model = Model(CFG, ch=3)
    model.hyp = hyp_scaled
    model.gr = 1.0
    model.train()
    init_sd = {k: v.clone() for k, v in model.state_dict().items()}
    loss_fn = ref("utils.loss").ComputeLoss(model, kpt_label=5)

    pg0, pg1, pg2 = [], [], []
    for k, v in model.named_modules():
        if hasattr(v, "bias") and isinstance(v.bias, nn.Parameter):
            pg2.append(v.bias)
        if isinstance(v, nn.BatchNorm2d):
            pg0.append(v.weight)
        elif hasattr(v, "weight") and isinstance(v.weight, nn.Parameter):
            pg1.append(v.weight)
        if hasattr(v, "im"):
            for iv in ([v.im] if hasattr(v.im, "implicit") else v.im):
                pg0.append(iv.implicit)
        if hasattr(v, "ia"):
            for iv in ([v.ia] if hasattr(v.ia, "implicit") else v.ia):
                pg0.append(iv.implicit)
    optimizer = optim.SGD(pg0, lr=hyp_scaled["lr0"],
                          momentum=hyp_scaled["momentum"], nesterov=True)
    optimizer.add_param_group({"params": pg1,
                               "weight_decay": hyp_scaled["weight_decay"]})
    optimizer.add_param_group({"params": pg2})
    for g in optimizer.param_groups:
        g["initial_lr"] = hyp_scaled["lr0"]

    lf = lambda e: ((1 + math.cos(math.pi * e / EPOCHS)) / 2) * \
        (1 - hyp_scaled["lrf"]) + hyp_scaled["lrf"]
    ema = ref("utils.torch_utils").ModelEMA(model)

    losses = []
    for ni, (images, labels) in enumerate(batches):
        epoch = ni // STEPS_PER_EPOCH
        if ni <= NW:
            xi = [0, NW]
            for j, g in enumerate(optimizer.param_groups):
                g["lr"] = np.interp(ni, xi, [
                    hyp_scaled["warmup_bias_lr"] if j == 2 else 0.0,
                    g["initial_lr"] * lf(epoch)])
                g["momentum"] = np.interp(ni, xi, [
                    hyp_scaled["warmup_momentum"], hyp_scaled["momentum"]])
        else:
            # LambdaLR stepped at each epoch end (train.py:469)
            for g in optimizer.param_groups:
                g["lr"] = g["initial_lr"] * lf(epoch)
        x = torch.from_numpy(
            images.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
        pred = model(x)
        loss, items = loss_fn(pred, torch.from_numpy(labels))
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        ema.update(model)
        losses.append(float(loss))
    return init_sd, model, ema, losses


def test_train_step_lockstep_vs_reference():
    spec = load_spec(CFG)
    hyp = dict(HYP_SCRATCH_P6)
    hyp_scaled = scale_loss_gains(hyp, spec.nl, spec.nc, IMGSZ)
    batches = _make_batches(spec)

    init_sd, ref_model, ref_ema, ref_losses = _run_reference(
        batches, hyp_scaled)

    # ---- ours: identical converted init, same batches ----
    variables = convert_state_dict(init_sd)
    model = YoloFace(spec=spec.resolve())
    cfg = TrainConfig(epochs=EPOCHS, steps_per_epoch=STEPS_PER_EPOCH,
                      lr0=hyp["lr0"], lrf=hyp["lrf"],
                      momentum=hyp["momentum"],
                      weight_decay=hyp["weight_decay"],
                      warmup_epochs=0.0, min_warmup_steps=NW,
                      warmup_momentum=hyp["warmup_momentum"],
                      warmup_bias_lr=hyp["warmup_bias_lr"],
                      batch_size=BS)
    step = make_train_step(model, cfg, hyp, IMGSZ)
    state = create_train_state(variables)
    grids = [(IMGSZ // s, IMGSZ // s) for s in spec.strides]
    got_losses = []
    for images, labels in batches:
        targets = jax.tree.map(jnp.asarray, build_targets_batched(
            labels, BS, spec, grids, anchor_t=hyp["anchor_t"]))
        state, loss, _ = step(state, jnp.asarray(images), targets)
        got_losses.append(float(loss))

    # per-step losses track the reference through warmup AND the first
    # post-warmup cosine step
    np.testing.assert_allclose(got_losses, ref_losses, rtol=5e-4,
                               err_msg=f"{got_losses} vs {ref_losses}")

    # final parameters: convert the torch result and compare leaf-wise.
    # Tolerance: forward parity is ~2e-4 relative on activations; after 4
    # SGD steps the drift stays well under the update magnitudes.
    want = convert_state_dict(
        {k: v.detach() for k, v in ref_model.state_dict().items()})
    got_p = jax.tree.map(np.asarray, jax.device_get(state.params))
    flat_w = jax.tree_util.tree_flatten_with_path(want["params"])[0]
    flat_g = jax.tree_util.tree_flatten_with_path(got_p)[0]
    assert len(flat_w) == len(flat_g)
    checked = 0
    for (kp, w), (_, g) in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            g, w, rtol=5e-3, atol=5e-5,
            err_msg=str(tuple(k.key for k in kp)))
        checked += 1
    assert checked > 50

    # EMA parameters (ramped decay, utils/torch_utils.py:285)
    want_ema = convert_state_dict(
        {k: v.detach() for k, v in ref_ema.ema.state_dict().items()})
    got_ema = jax.tree.map(np.asarray, jax.device_get(state.ema_params))
    for (kp, w), (_, g) in zip(
            jax.tree_util.tree_flatten_with_path(want_ema["params"])[0],
            jax.tree_util.tree_flatten_with_path(got_ema)[0]):
        np.testing.assert_allclose(
            g, w, rtol=5e-3, atol=5e-5,
            err_msg="ema " + str(tuple(k.key for k in kp)))

    # BN running statistics follow the same update rule
    got_bs = jax.tree.map(np.asarray, jax.device_get(state.batch_stats))
    for (kp, w), (_, g) in zip(
            jax.tree_util.tree_flatten_with_path(
                want["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(got_bs)[0]):
        np.testing.assert_allclose(
            g, w, rtol=5e-3, atol=5e-4,
            err_msg="bn " + str(tuple(k.key for k in kp)))


def test_adam_lockstep_vs_reference():
    """--adam path: torch.optim.Adam(betas=(momentum, 0.999)) with the
    same 3 param groups (train.py:182-189) vs trainer.py's adam_apply,
    lockstep over 3 steps (warmup lr interp on, no momentum warmup for
    Adam — train.py:412-414)."""
    torch = seeded_torch(1)
    import torch.nn as nn
    import torch.optim as optim

    spec = load_spec(CFG)
    hyp = dict(HYP_SCRATCH_P6)
    hyp_scaled = scale_loss_gains(hyp, spec.nl, spec.nc, IMGSZ)
    batches = _make_batches(spec)[:3]

    Model = ref("models.yolo").Model
    model = Model(CFG, ch=3)
    model.hyp = hyp_scaled
    model.gr = 1.0
    model.train()
    init_sd = {k: v.clone() for k, v in model.state_dict().items()}
    loss_fn = ref("utils.loss").ComputeLoss(model, kpt_label=5)

    pg0, pg1, pg2 = [], [], []
    for k, v in model.named_modules():
        if hasattr(v, "bias") and isinstance(v.bias, nn.Parameter):
            pg2.append(v.bias)
        if isinstance(v, nn.BatchNorm2d):
            pg0.append(v.weight)
        elif hasattr(v, "weight") and isinstance(v.weight, nn.Parameter):
            pg1.append(v.weight)
    optimizer = optim.Adam(pg0, lr=hyp_scaled["lr0"],
                           betas=(hyp_scaled["momentum"], 0.999))
    optimizer.add_param_group(
        {"params": pg1, "weight_decay": hyp_scaled["weight_decay"]})
    optimizer.add_param_group({"params": pg2})
    for g in optimizer.param_groups:
        g["initial_lr"] = hyp_scaled["lr0"]
    import math
    lf = lambda e: ((1 + math.cos(math.pi * e / EPOCHS)) / 2) * \
        (1 - hyp_scaled["lrf"]) + hyp_scaled["lrf"]

    ref_losses = []
    for ni, (images, labels) in enumerate(batches):
        epoch = ni // STEPS_PER_EPOCH
        if ni <= NW:
            for j, g in enumerate(optimizer.param_groups):
                g["lr"] = np.interp(ni, [0, NW], [
                    hyp_scaled["warmup_bias_lr"] if j == 2 else 0.0,
                    g["initial_lr"] * lf(epoch)])
        else:
            for g in optimizer.param_groups:
                g["lr"] = g["initial_lr"] * lf(epoch)
        x = torch.from_numpy(
            images.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
        loss, _ = loss_fn(model(x), torch.from_numpy(labels))
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        ref_losses.append(float(loss.detach()))

    variables = convert_state_dict(init_sd)
    model_j = YoloFace(spec=spec.resolve())
    cfg = TrainConfig(epochs=EPOCHS, steps_per_epoch=STEPS_PER_EPOCH,
                      lr0=hyp["lr0"], lrf=hyp["lrf"],
                      momentum=hyp["momentum"],
                      weight_decay=hyp["weight_decay"],
                      warmup_epochs=0.0, min_warmup_steps=NW,
                      warmup_momentum=hyp["warmup_momentum"],
                      warmup_bias_lr=hyp["warmup_bias_lr"],
                      batch_size=BS, optimizer="adam")
    step = make_train_step(model_j, cfg, hyp, IMGSZ)
    state = create_train_state(variables, optimizer="adam")
    grids = [(IMGSZ // s, IMGSZ // s) for s in spec.strides]
    got_losses = []
    for images, labels in batches:
        targets = jax.tree.map(jnp.asarray, build_targets_batched(
            labels, BS, spec, grids, anchor_t=hyp["anchor_t"]))
        state, loss, _ = step(state, jnp.asarray(images), targets)
        got_losses.append(float(loss))

    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-3,
                               err_msg=f"{got_losses} vs {ref_losses}")
    want = convert_state_dict(
        {k: v.detach() for k, v in model.state_dict().items()})
    got_p = jax.tree.map(np.asarray, jax.device_get(state.params))
    # Adam's update is ~lr*sign(g) when the second moment is tiny, so
    # the 2e-4 forward-parity noise can flip near-zero gradient signs
    # and produce full-step param differences; the correct bound is a
    # small multiple of the total lr applied over the 3 warmup steps,
    # not the SGD-style tolerance (losses above already match to 1e-3).
    # a full sign flip accumulates at most ~sum of the step lrs — for
    # biases the warmup lr starts at warmup_bias_lr=0.1, so the global
    # bound is a small multiple of that; judge globally (tiny tensors
    # make per-tensor fractions brittle)
    max_step = 3.0 * hyp["warmup_bias_lr"]
    diffs = np.concatenate([
        np.abs(np.asarray(g) - np.asarray(w)).ravel()
        for (_, w), (_, g) in zip(
            jax.tree_util.tree_flatten_with_path(want["params"])[0],
            jax.tree_util.tree_flatten_with_path(got_p)[0])])
    assert diffs.max() <= max_step, diffs.max()
    assert (diffs > 2e-3).mean() < 0.01, float((diffs > 2e-3).mean())
    assert np.median(diffs) < 2e-4
