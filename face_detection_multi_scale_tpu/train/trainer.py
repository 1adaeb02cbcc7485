"""The training engine: SGD with the reference's 3-group semantics,
warmup + one-cycle cosine schedule, EMA, and a mesh-sharded train step.

Reference parity (train.py):
  * 3 param groups — BN scales & implicit priors (no decay), conv/linear
    kernels (weight decay), biases (no decay, separate warmup lr)
    (train.py:161-189)
  * nesterov SGD, momentum 0.937 (train.py:182-185)
  * one-cycle cosine lr per epoch: lf(e) = ((1+cos(pi e/E))/2)(1-lrf)+lrf
    (utils/general.py:220-222, train.py:194-198)
  * linear warmup over max(3 epochs, 1000 iters): lr from 0 (biases: from
    warmup_bias_lr) to lr0*lf(epoch); momentum from 0.8 to 0.937
    (train.py:406-414)
  * loss gain scaling by level count / nc / image area (train.py:347-349)
  * EMA decay 0.9999 * (1 - exp(-updates/2000)) (utils/torch_utils.py:285)

TPU-native differences: DDP gradient allreduce becomes jit-on-mesh (the
batch axis is sharded; XLA inserts the psum), SyncBN is implicit because
batch-norm statistics reduce over the full global batch under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from face_detection_multi_scale_tpu.models.model import YoloFace
from face_detection_multi_scale_tpu.train.loss import compute_loss_batched


def one_cycle_lf(epoch, epochs: int, lrf: float):
    """Cosine interpolation 1 -> lrf over `epochs` (utils/general.py:220)."""
    return ((1 + jnp.cos(jnp.pi * epoch / epochs)) / 2) * (1 - lrf) + lrf


def scale_loss_gains(hyp: Dict[str, float], nl: int, nc: int,
                     img_size: int) -> Dict[str, float]:
    """Reference loss-gain renormalization (train.py:347-349)."""
    h = dict(hyp)
    h["box"] = hyp["box"] * 3.0 / nl
    h["cls"] = hyp["cls"] * nc / 80.0 * 3.0 / nl
    h["obj"] = hyp["obj"] * (img_size / 640.0) ** 2 * 3.0 / nl
    return h


def _param_group(path: Tuple[str, ...]) -> str:
    """Classify a param leaf: 'kernel' (decayed), 'bias', or 'other'
    (BN scales + implicit priors, no decay) — train.py:161-180."""
    leaf = path[-1]
    if leaf == "kernel":
        return "kernel"
    if leaf == "bias":
        return "bias"
    return "other"


def _layer_index(path: Tuple[str, ...]):
    """Graph-node index of a param leaf from its top-level module name
    (`model_{i}` / `model_{i}_{j}`), mirroring the reference's
    `model.{i}.` param-name parsing (train.py:113-119)."""
    top = path[0]
    if top.startswith("model_"):
        part = top.split("_")[1]
        if part.isdigit():
            return int(part)
    return None


def freeze_tree(params, freeze_until):
    """Pytree of bool: True = parameter frozen (layers 0..freeze_until,
    the reference --freeze-until semantics, train.py:101-146). BN running
    statistics still update in train mode, as they do for the reference's
    requires_grad=False layers under model.train()."""
    if freeze_until is None:
        return jax.tree.map(lambda _: False, params)
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: (lambda li: li is not None and li <= freeze_until)(
            _layer_index(tuple(k.key for k in kp))), params)


def freeze_summary(params, freeze_until):
    """(frozen_param_count, trainable_param_count, frozen_layer_indices)
    — the reference's freezing report (train.py:121-146)."""
    frozen = trainable = 0
    layers = set()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for kp, leaf in flat:
        path = tuple(k.key for k in kp)
        li = _layer_index(path)
        if freeze_until is not None and li is not None and \
                li <= freeze_until:
            frozen += leaf.size
            layers.add(li)
        else:
            trainable += leaf.size
    return frozen, trainable, sorted(layers)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    momentum_buf: Any  # SGD momentum / Adam first moment
    ema_params: Any
    ema_updates: jnp.ndarray
    # Adam second moment; None for SGD (no memory cost)
    second_moment: Any = None


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 300
    steps_per_epoch: int = 1000
    lr0: float = 0.01
    lrf: float = 0.2
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    nominal_batch: int = 64
    batch_size: int = 64
    ema_decay: float = 0.9999
    linear_lr: bool = False
    # the reference floors warmup at 1000 iterations (train.py:398);
    # configurable so tiny datasets can actually leave warmup
    min_warmup_steps: int = 1000
    # freeze graph nodes 0..freeze_until (reference --freeze-until,
    # train.py:101-146); None trains all layers
    freeze_until: Any = None
    # "sgd" (nesterov, the default) or "adam" (reference --adam,
    # train.py:182-185)
    optimizer: str = "sgd"

    @property
    def warmup_steps(self) -> int:
        return max(int(round(self.warmup_epochs * self.steps_per_epoch)),
                   self.min_warmup_steps, 1)

    def lr_at(self, step, group: str):
        """Per-step lr for a param group, reproducing the per-iteration
        warmup interpolation over the per-epoch scheduled lr
        (train.py:406-414)."""
        epoch = jnp.floor(step / self.steps_per_epoch)
        if self.linear_lr:
            lf = (1 - epoch / self.epochs) * (1.0 - self.lrf) + self.lrf
        else:
            lf = one_cycle_lf(epoch, self.epochs, self.lrf)
        lr = self.lr0 * lf
        nw = self.warmup_steps
        start = self.warmup_bias_lr if group == "bias" else 0.0
        frac = jnp.clip(step / nw, 0.0, 1.0)
        warm = start + (lr - start) * frac
        return jnp.where(step < nw, warm, lr)

    def momentum_at(self, step):
        nw = self.warmup_steps
        frac = jnp.clip(step / nw, 0.0, 1.0)
        warm = self.warmup_momentum + \
            (self.momentum - self.warmup_momentum) * frac
        return jnp.where(step < nw, warm, self.momentum)


def create_train_state(variables, optimizer: str = "sgd") -> TrainState:
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        momentum_buf=zeros,
        ema_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        ema_updates=jnp.zeros((), jnp.int32),
        second_moment=(jax.tree.map(jnp.zeros_like, params)
                       if optimizer == "adam" else None),
    )


def _group_tree(params):
    paths_groups = jax.tree_util.tree_map_with_path(
        lambda kp, _: _param_group(tuple(
            k.key for k in kp)), params)
    return paths_groups


def sgd_apply(cfg: TrainConfig, params, grads, bufs, step):
    """Nesterov SGD with coupled weight decay on kernels and per-group lr,
    matching torch.optim.SGD semantics (train.py:182-189). Frozen leaves
    (cfg.freeze_until) pass through unchanged — the requires_grad=False
    equivalent."""
    groups = _group_tree(params)
    frozen = freeze_tree(params, cfg.freeze_until)
    mom = cfg.momentum_at(step)
    lr_k = cfg.lr_at(step, "kernel")
    lr_b = cfg.lr_at(step, "bias")
    lr_o = cfg.lr_at(step, "other")

    def upd(p, g, buf, grp, frz):
        if frz:
            return p, buf
        g = g.astype(jnp.float32)
        if grp == "kernel":
            g = g + cfg.weight_decay * p
        new_buf = mom * buf + g
        d_p = g + mom * new_buf  # nesterov
        lr = {"kernel": lr_k, "bias": lr_b, "other": lr_o}[grp]
        return p - lr * d_p, new_buf

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_b = treedef.flatten_up_to(bufs)
    flat_grp = treedef.flatten_up_to(groups)
    flat_frz = treedef.flatten_up_to(frozen)
    new_p, new_b = [], []
    for p, g, b, grp, frz in zip(flat_p, flat_g, flat_b, flat_grp,
                                 flat_frz):
        np_, nb_ = upd(p, g, b, grp, frz)
        new_p.append(np_)
        new_b.append(nb_)
    return (jax.tree_util.tree_unflatten(treedef, new_p),
            jax.tree_util.tree_unflatten(treedef, new_b))


def adam_apply(cfg: TrainConfig, params, grads, m, v, sched_step,
               apply_step):
    """torch.optim.Adam semantics with betas=(momentum, 0.999), eps 1e-8,
    coupled L2 on kernels (the reference --adam path, train.py:183-189).
    The warmup lr interp is evaluated at `sched_step` (the global
    micro-iteration, like SGD); the bias correction counts optimizer
    APPLIES (`apply_step`, torch's per-param step counter). beta1 is NOT
    warmed — the reference warmup writes g['momentum'] only when the
    group has one (train.py:412-414), and Adam groups don't."""
    groups = _group_tree(params)
    frozen = freeze_tree(params, cfg.freeze_until)
    b1, b2, eps = cfg.momentum, 0.999, 1e-8
    lr_k = cfg.lr_at(sched_step, "kernel")
    lr_b = cfg.lr_at(sched_step, "bias")
    lr_o = cfg.lr_at(sched_step, "other")
    t = (apply_step + 1).astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, g, m_i, v_i, grp, frz):
        if frz:
            return p, m_i, v_i
        g = g.astype(jnp.float32)
        if grp == "kernel":
            g = g + cfg.weight_decay * p
        new_m = b1 * m_i + (1.0 - b1) * g
        new_v = b2 * v_i + (1.0 - b2) * g * g
        lr = {"kernel": lr_k, "bias": lr_b, "other": lr_o}[grp]
        denom = jnp.sqrt(new_v / bc2) + eps
        return p - lr * (new_m / bc1) / denom, new_m, new_v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat = [treedef.flatten_up_to(t_) for t_ in
            (grads, m, v, groups, frozen)]
    new_p, new_m, new_v = [], [], []
    for p, g, m_i, v_i, grp, frz in zip(flat_p, *flat):
        a, b, c = upd(p, g, m_i, v_i, grp, frz)
        new_p.append(a)
        new_m.append(b)
        new_v.append(c)
    unf = jax.tree_util.tree_unflatten
    return unf(treedef, new_p), unf(treedef, new_m), unf(treedef, new_v)


def optimizer_apply(cfg: TrainConfig, state: TrainState, grads,
                    sched_step):
    """Dispatch SGD / Adam; returns (params, momentum_buf,
    second_moment)."""
    if cfg.optimizer == "adam":
        return adam_apply(cfg, state.params, grads, state.momentum_buf,
                          state.second_moment, sched_step, state.step)
    p, bufs = sgd_apply(cfg, state.params, grads, state.momentum_buf,
                        sched_step)
    return p, bufs, state.second_moment


def ema_update(cfg: TrainConfig, ema_params, params, updates):
    """ModelEMA ramped decay (utils/torch_utils.py:269-303)."""
    d = cfg.ema_decay * (1 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    return jax.tree.map(
        lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema_params,
        params)


def make_train_step(model: YoloFace, cfg: TrainConfig, hyp: Dict[str, float],
                    img_size: int) -> Callable:
    """Build the jitted train step. Shard `images` and every `targets`
    leaf along the mesh data axis before calling; params/state replicate.
    """
    spec = model.spec
    h = scale_loss_gains(hyp, spec.nl, spec.nc, img_size)

    def step_fn(state: TrainState, images, targets):
        # uint8 batches normalize on device (the imgs/255 of the
        # reference batch loop, train.py:403)
        if jnp.issubdtype(images.dtype, jnp.integer):
            images = images.astype(jnp.float32) / 255.0

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            raws, updated = model.apply(variables, images, train=True,
                                        mutable=["batch_stats"])
            loss, components = compute_loss_batched(
                raws, targets, h, nc=spec.nc, nkpt=spec.nkpt, gr=1.0)
            return loss, (components, updated["batch_stats"])

        return _optimize(state, loss_fn, cfg)

    return jax.jit(step_fn, donate_argnums=(0,))


def _optimize(state: TrainState, loss_fn, cfg: TrainConfig):
    (loss, (components, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_params, new_bufs, new_v = optimizer_apply(cfg, state, grads,
                                                  state.step)
    ema_updates = state.ema_updates + 1
    new_ema = ema_update(cfg, state.ema_params, new_params, ema_updates)
    new_state = state.replace(
        step=state.step + 1, params=new_params, batch_stats=new_stats,
        momentum_buf=new_bufs, second_moment=new_v, ema_params=new_ema,
        ema_updates=ema_updates)
    return new_state, loss, components


def make_accum_steps(model: YoloFace, cfg: TrainConfig,
                     hyp: Dict[str, float], img_size: int):
    """Gradient-accumulation pair: `grad_fn(state, images, targets,
    grads_acc)` accumulates summed gradients over micro-batches (the
    loss.backward() accumulation semantics, train.py:409,437-442) and
    `apply_fn(state, grads, sched_step)` performs one optimizer + EMA
    step with the lr/momentum schedule evaluated at the global
    micro-iteration `sched_step` (the reference's `ni`)."""
    spec = model.spec
    h = scale_loss_gains(hyp, spec.nl, spec.nc, img_size)

    def grad_fn(state: TrainState, images, targets, grads_acc):
        if jnp.issubdtype(images.dtype, jnp.integer):
            images = images.astype(jnp.float32) / 255.0

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            raws, updated = model.apply(variables, images, train=True,
                                        mutable=["batch_stats"])
            loss, components = compute_loss_batched(
                raws, targets, h, nc=spec.nc, nkpt=spec.nkpt, gr=1.0)
            return loss, (components, updated["batch_stats"])

        (loss, (components, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        new_state = state.replace(batch_stats=new_stats)
        return new_state, grads_acc, loss, components

    def apply_fn(state: TrainState, grads, sched_step):
        # `sched_step` is the GLOBAL MICRO-iteration counter (the
        # reference's `ni`): warmup and the per-epoch cosine schedule are
        # counted in micro-batches (train.py:398,406-414), not optimizer
        # applies, so with accumulation the schedule must not be driven
        # off state.step (which advances once per apply).
        new_params, new_bufs, new_v = optimizer_apply(cfg, state, grads,
                                                      sched_step)
        ema_updates = state.ema_updates + 1
        new_ema = ema_update(cfg, state.ema_params, new_params,
                             ema_updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            momentum_buf=new_bufs, second_moment=new_v,
            ema_params=new_ema, ema_updates=ema_updates)

    return (jax.jit(grad_fn, donate_argnums=(3,)),
            jax.jit(apply_fn, donate_argnums=(0,)))


def zero_grads_like(params):
    return jax.tree.map(jnp.zeros_like, params)
