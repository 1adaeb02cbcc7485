"""Device-side detection loss: EIoU box + balanced objectness BCE +
class BCE + Wing landmark loss + landmark-visibility BCE.

jnp re-design of the reference ComputeLoss (reference utils/loss.py:115-203)
operating on the fixed-capacity targets from train/targets.py: all gathers
are static-shape, masked rows contribute exactly zero, and means divide by
the true (masked) counts so padded capacity never changes the value.

Loss formula parity (reference utils/loss.py):
  lbox  = mean(1 - EIoU(pred, target))                 (:160-163)
  lobj  = sum_l balance[l] * BCE(obj_logits, tobj)     (:188-189)
          with tobj = (1-gr) + gr * clamp(iou, 0)      (:176)
  lcls  = BCE with label smoothing, nc > 1 only        (:179-182)
  lkptv = BCE(kpt_score_logits, kpt_mask)              (:171)
  lkpt  = Wing(kpt_xy, target) averaged over the mask  (:164-173, :87-113)
  total = (box*lbox + obj*lobj + cls*lcls + cls*lkptv + kpt*lkpt) * bs
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.ops.boxes import bbox_iou

BALANCE_3 = (4.0, 1.0, 0.4)
BALANCE_P6 = (4.0, 1.0, 0.25, 0.06, 0.02)


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    """Positive/negative label-smoothing targets (utils/loss.py:10-12)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight=1.0):
    """Elementwise BCE-with-logits with positive weighting (matches
    torch.nn.BCEWithLogitsLoss(pos_weight) before reduction)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_scale(logits, targets, gamma: float, alpha: float = 0.25):
    """Focal-loss modulation factor (utils/loss.py:32-57, TF formulation)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_t * (1.0 - p_t) ** gamma


def wing(diff, w: float = 10.0, e: float = 2.0):
    """Wing loss on |diff| (utils/loss.py:87-103)."""
    c = w - w * math.log(1 + w / e)
    ad = jnp.abs(diff)
    return jnp.where(ad < w, w * jnp.log(1 + ad / e), ad - c)


def compute_loss(raw_preds: Sequence[jnp.ndarray], targets: Dict[str, tuple],
                 hyp: Dict[str, float], *, nc: int, nkpt: int,
                 gr: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """raw_preds: per-level (bs, na, ny, nx, no) maps (training output of
    the head); targets: pytree from targets_to_arrays. Returns
    (loss * bs, components (lbox, lobj, lcls, lkpt, lkptv, total))."""
    nl = len(raw_preds)
    balance = BALANCE_3 if nl == 3 else BALANCE_P6
    cp, cn = smooth_bce(hyp.get("label_smoothing", 0.0))
    fl_gamma = hyp.get("fl_gamma", 0.0)
    cls_pw = hyp.get("cls_pw", 1.0)
    obj_pw = hyp.get("obj_pw", 1.0)

    zero = jnp.zeros((), jnp.float32)
    lbox = lobj = lcls = lkpt = lkptv = zero
    bs = raw_preds[0].shape[0]

    for i, pi in enumerate(raw_preds):
        pi = pi.astype(jnp.float32)
        b = targets["b"][i]
        a = targets["a"][i]
        gj = targets["gj"][i]
        gi = targets["gi"][i]
        mask = targets["mask"][i].astype(jnp.float32)
        denom = jnp.maximum(mask.sum(), 1.0)

        ps = pi[b, a, gj, gi]  # (cap, no) gathered predictions

        # --- box regression (EIoU) ---
        pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * targets["anchors"][i]
        pbox = jnp.concatenate([pxy, pwh], axis=1)
        iou = bbox_iou(pbox, targets["tbox"][i], xywh=True, kind="eiou")
        lbox = lbox + ((1.0 - iou) * mask).sum() / denom

        # --- keypoints ---
        if nkpt:
            pkpt_x = ps[:, 6::3] * 2.0 - 0.5
            pkpt_y = ps[:, 7::3] * 2.0 - 0.5
            pkpt_score = ps[:, 8::3]
            tkpt = targets["tkpt"][i]
            kpt_mask = (tkpt[:, 0::2] != 0).astype(jnp.float32) * mask[:, None]
            # visibility BCE over ALL rows (reference means over every
            # element, utils/loss.py:171); masked rows contribute their
            # (pred vs 0) term exactly like reference padding would not —
            # so we mask and renormalize by valid element count instead.
            v = bce_with_logits(pkpt_score, (tkpt[:, 0::2] != 0).astype(
                jnp.float32), cls_pw) * mask[:, None]
            lkptv = lkptv + v.sum() / jnp.maximum(mask.sum() * pkpt_score.shape[1], 1.0)
            ksum = jnp.maximum(kpt_mask.sum(), 1e-9)
            lx = (wing((pkpt_x - tkpt[:, 0::2]) * kpt_mask)).sum() / ksum
            ly = (wing((pkpt_y - tkpt[:, 1::2]) * kpt_mask)).sum() / ksum
            lkpt = lkpt + (lx + ly) / 2.0

        # --- objectness ---
        tobj = jnp.zeros(pi.shape[:4], jnp.float32)
        val = ((1.0 - gr) + gr * jax.lax.stop_gradient(
            jnp.clip(iou, 0.0, None))) * mask
        # max-combine duplicates (reference overwrites in order; max is the
        # deterministic equivalent for values in [0, 1])
        tobj = tobj.at[b, a, gj, gi].max(val)
        obj_bce = bce_with_logits(pi[..., 4], tobj, obj_pw)
        if fl_gamma > 0:
            obj_bce = obj_bce * focal_scale(pi[..., 4], tobj, fl_gamma)
        lobj = lobj + obj_bce.mean() * balance[i]

        # --- classification (multi-class only) ---
        if nc > 1:
            t = jnp.full((ps.shape[0], nc), cn, jnp.float32)
            t = t.at[jnp.arange(ps.shape[0]), targets["tcls"][i]].set(cp)
            cls_bce = bce_with_logits(ps[:, 5:5 + nc], t, cls_pw)
            if fl_gamma > 0:
                cls_bce = cls_bce * focal_scale(ps[:, 5:5 + nc], t, fl_gamma)
            lcls = lcls + (cls_bce * mask[:, None]).sum() / (denom * nc)

    lbox = lbox * hyp["box"]
    lobj = lobj * hyp["obj"]
    lcls = lcls * hyp["cls"]
    lkptv = lkptv * hyp["cls"]
    lkpt = lkpt * hyp["kpt"]
    total = lbox + lobj + lcls + lkpt + lkptv
    components = jnp.stack([lbox, lobj, lcls, lkpt, lkptv, total])
    return total * bs, components


def compute_loss_batched(raw_preds: Sequence[jnp.ndarray],
                         targets: Dict[str, tuple],
                         hyp: Dict[str, float], *, nc: int, nkpt: int,
                         gr: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SPMD-friendly loss: targets carry a (B, cap, ...) layout from
    build_targets_batched, so all gathers are per-image (vmapped) and the
    computation shards cleanly along the batch axis of a data-parallel
    mesh — only the final scalar reductions cross devices.

    Numerically identical to `compute_loss` (same reference semantics)."""
    nl = len(raw_preds)
    balance = BALANCE_3 if nl == 3 else BALANCE_P6
    cp, cn = smooth_bce(hyp.get("label_smoothing", 0.0))
    fl_gamma = hyp.get("fl_gamma", 0.0)
    cls_pw = hyp.get("cls_pw", 1.0)
    obj_pw = hyp.get("obj_pw", 1.0)

    zero = jnp.zeros((), jnp.float32)
    lbox = lobj = lcls = lkpt = lkptv = zero
    bs = raw_preds[0].shape[0]

    for i, pi in enumerate(raw_preds):
        pi = pi.astype(jnp.float32)
        a = targets["a"][i]        # (B, cap)
        gj = targets["gj"][i]
        gi = targets["gi"][i]
        mask = targets["mask"][i].astype(jnp.float32)  # (B, cap)
        denom = jnp.maximum(mask.sum(), 1.0)

        ps = jax.vmap(lambda p, aa, jj, ii: p[aa, jj, ii])(
            pi, a, gj, gi)  # (B, cap, no)

        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * \
            targets["anchors"][i]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, targets["tbox"][i], xywh=True, kind="eiou")
        lbox = lbox + ((1.0 - iou) * mask).sum() / denom

        if nkpt:
            pkpt_x = ps[..., 6::3] * 2.0 - 0.5
            pkpt_y = ps[..., 7::3] * 2.0 - 0.5
            pkpt_score = ps[..., 8::3]
            tkpt = targets["tkpt"][i]
            vis = (tkpt[..., 0::2] != 0).astype(jnp.float32)
            kpt_mask = vis * mask[..., None]
            v = bce_with_logits(pkpt_score, vis, cls_pw) * mask[..., None]
            lkptv = lkptv + v.sum() / jnp.maximum(
                mask.sum() * pkpt_score.shape[-1], 1.0)
            ksum = jnp.maximum(kpt_mask.sum(), 1e-9)
            lx = wing((pkpt_x - tkpt[..., 0::2]) * kpt_mask).sum() / ksum
            ly = wing((pkpt_y - tkpt[..., 1::2]) * kpt_mask).sum() / ksum
            lkpt = lkpt + (lx + ly) / 2.0

        val = ((1.0 - gr) + gr * jax.lax.stop_gradient(
            jnp.clip(iou, 0.0, None))) * mask
        tobj = jax.vmap(
            lambda aa, jj, ii, vv, shape=pi.shape[1:4]:
            jnp.zeros(shape, jnp.float32).at[aa, jj, ii].max(vv))(
                a, gj, gi, val)
        obj_bce = bce_with_logits(pi[..., 4], tobj, obj_pw)
        if fl_gamma > 0:
            obj_bce = obj_bce * focal_scale(pi[..., 4], tobj, fl_gamma)
        lobj = lobj + obj_bce.mean() * balance[i]

        if nc > 1:
            t = jnp.full(ps.shape[:-1] + (nc,), cn, jnp.float32)
            onehot = jax.nn.one_hot(targets["tcls"][i], nc) * (cp - cn)
            t = t + onehot
            cls_bce = bce_with_logits(ps[..., 5:5 + nc], t, cls_pw)
            if fl_gamma > 0:
                cls_bce = cls_bce * focal_scale(ps[..., 5:5 + nc], t,
                                                fl_gamma)
            lcls = lcls + (cls_bce * mask[..., None]).sum() / (denom * nc)

    lbox = lbox * hyp["box"]
    lobj = lobj * hyp["obj"]
    lcls = lcls * hyp["cls"]
    lkptv = lkptv * hyp["cls"]
    lkpt = lkpt * hyp["kpt"]
    total = lbox + lobj + lcls + lkpt + lkptv
    components = jnp.stack([lbox, lobj, lcls, lkpt, lkptv, total])
    return total * bs, components
