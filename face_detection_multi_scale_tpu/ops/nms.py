"""On-device, fixed-capacity non-maximum suppression and the full
postprocess pipeline.

TPU-native re-design of the reference postprocess
(utils/general.py:506-600 `non_max_suppression`,
multi_scale_face_detector.py:168-240 `calculate_scale_weights` /
`weighted_nms`): data-dependent box counts become fixed-capacity buffers
with validity masks, torchvision.ops.nms becomes a select-max/suppress
`lax.fori_loop`, and the whole path (conf gate -> conf=obj*cls ->
xywh->xyxy -> class offset -> NMS) stays on device so the only host
transfer is the final (max_det, 6+3*nkpt) block per image.

Greedy NMS semantics match torchvision: boxes processed in descending
score order, a box is suppressed when IoU with an already-kept box is
strictly greater than the threshold.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.ops.boxes import box_iou, xywh2xyxy

MAX_WH = 4096  # class-offset multiplier (reference utils/general.py:518)
NEG_INF = -1e30


class Detections(NamedTuple):
    """Fixed-capacity per-image detections.

    boxes:  (..., max_det, 4) xyxy in network-input pixels
    scores: (..., max_det)
    classes: (..., max_det)
    extras: (..., max_det, E) landmark triplets (x, y, conf) * nkpt, or E=0
    valid:  (..., max_det) bool
    n_gated: (...,) int32 — how many rows cleared the confidence gate
        BEFORE the fixed `max_candidates` truncation, or None when the
        producer didn't count. n_gated > max_candidates means candidates
        were silently dropped (the accuracy knob of the fixed-capacity
        design); `truncation_stats` turns this into a report.
    """
    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    extras: jnp.ndarray
    valid: jnp.ndarray
    n_gated: jnp.ndarray = None

    @property
    def count(self):
        return self.valid.sum(-1)


def truncation_stats(n_gated, max_candidates: int) -> dict:
    """Summarize candidate-truncation telemetry for a run.

    The reference NMS admits every gated box up to max_nms=30000 and
    loses nothing silently (utils/general.py:518-524); our fixed
    `max_candidates` cap does truncate when a crowded image exceeds it.
    Feed the accumulated per-image `Detections.n_gated` values here and
    surface the result in eval CLIs."""
    import numpy as np

    n = np.asarray(n_gated).reshape(-1)
    truncated = n > max_candidates
    return {
        "images": int(n.size),
        "truncated_images": int(truncated.sum()),
        "max_gated": int(n.max()) if n.size else 0,
        "max_candidates": int(max_candidates),
        "dropped_total": int(np.clip(n - max_candidates, 0, None).sum()),
    }


def nms_indices(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float,
                max_det: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over (N, 4) xyxy boxes with (N,) scores; invalid
    candidates must carry score <= NEG_INF/2. Returns (max_det,) indices
    and a (max_det,) validity mask.

    Implemented as a select-max/suppress loop: max_det iterations of a
    vectorized argmax + IoU suppression — identical output to sequential
    greedy NMS truncated to max_det keeps.
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    def body(i, state):
        live_scores, keep_idx, keep_valid = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        ok = best_score > NEG_INF / 2
        keep_idx = keep_idx.at[i].set(jnp.where(ok, best, 0))
        keep_valid = keep_valid.at[i].set(ok)
        # suppress the chosen box and all boxes with IoU > thr against it
        bx1, by1, bx2, by2 = x1[best], y1[best], x2[best], y2[best]
        iw = jnp.clip(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0, None)
        ih = jnp.clip(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0, None)
        inter = iw * ih
        iou = inter / (areas + areas[best] - inter)
        suppress = (iou > iou_thres) | (
            jnp.arange(n) == best)
        live_scores = jnp.where(ok & suppress, NEG_INF, live_scores)
        return live_scores, keep_idx, keep_valid

    init = (scores,
            jnp.zeros((max_det,), jnp.int32),
            jnp.zeros((max_det,), bool))
    _, keep_idx, keep_valid = jax.lax.fori_loop(0, max_det, body, init)
    return keep_idx, keep_valid


def nms_keep_matrix(boxes: jnp.ndarray, scores: jnp.ndarray,
                    iou_thres: float, max_det: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TPU-fast exact greedy NMS via the suppression-matrix fixpoint.

    Same output contract as `nms_indices` but O(K^2) vectorized work per
    fixpoint sweep instead of max_det sequential argmax steps: sort by
    score, build the pairwise IoU > thr matrix restricted to
    higher-scoring suppressors (strict lower triangle in sorted order),
    then iterate ``keep = valid & ~any(sup & keep)`` with a
    `lax.while_loop` until convergence. The fixpoint equals sequential
    greedy NMS (a box is suppressed iff some kept higher-score box
    overlaps it); convergence takes at most the longest suppression-chain
    depth, typically < 10 sweeps.
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    k = boxes.shape[0]
    order = jnp.argsort(-scores)  # descending, ties by index
    b = boxes[order]
    s = scores[order]
    valid = s > NEG_INF / 2

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    iw = jnp.clip(jnp.minimum(x2[:, None], x2[None, :])
                  - jnp.maximum(x1[:, None], x1[None, :]), 0, None)
    ih = jnp.clip(jnp.minimum(y2[:, None], y2[None, :])
                  - jnp.maximum(y1[:, None], y1[None, :]), 0, None)
    inter = iw * ih
    iou = inter / (areas[:, None] + areas[None, :] - inter)
    idx = jnp.arange(k)
    # sup[i, j]: candidate i can be suppressed by higher-ranked j
    sup = (iou > iou_thres) & (idx[None, :] < idx[:, None]) & valid[None, :]

    def cond(carry):
        keep, prev, it = carry
        return jnp.any(keep != prev) & (it < k)

    def body(carry):
        keep, _, it = carry
        new = valid & ~jnp.any(sup & keep[None, :], axis=1)
        return new, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.array(0)))

    # first max_det kept candidates in score order
    pos = jnp.where(keep, idx, k)
    neg_top, sel = jax.lax.top_k(-pos, max_det)
    sel_valid = (-neg_top) < k
    keep_idx = jnp.where(sel_valid, order[sel], 0).astype(jnp.int32)
    return keep_idx, sel_valid


def _gather_candidates_planar(pred: jnp.ndarray, *, nc: int,
                              conf_thres: float, k: int, agnostic: bool):
    """Batched: decoded rows (bs, N, no) -> top-k candidates sorted by
    conf, everything PLANAR.

    TPU gather discipline (measured, tools/probe_gather.py +
    TRACE_EVAL_bf16.json, round 5): gathers here are per-ELEMENT bound,
    so the win is moving MORE per index, not fewer planes. At the eval
    point's shapes ((128, 25500) -> k=4096) four separate per-plane
    `take_along_axis` calls cost 27.0 ms in-graph while ONE packed
    (bs, N, 4) gather with idx[..., None] moves the same data in
    5.0 ms (5.4x); a flat (bs, 4N) gather with fused index math is
    20.6 ms and a 5-operand co-sort 7.6 ms. (A row-gather `pred[idx]`
    on (4096, 21) rows remains the catastrophic case — a serial
    dynamic-slice loop, ~1.6 s/batch at b128.) So the xywh block is
    gathered PACKED, and the landmark block is deferred entirely until
    after NMS (`_select_kept_planar` gathers it for the final max_det
    keepers only, also packed)."""
    obj = pred[..., 4]
    if nc == 1:
        conf = pred[..., 5] * obj
        cls = None  # all zeros
    else:
        cls_conf = pred[..., 5:5 + nc] * obj[..., None]
        conf = cls_conf.max(axis=-1)
        cls = cls_conf.argmax(axis=-1).astype(pred.dtype)
    # two-stage gate as in the reference: obj > thr then conf > thr
    gate = (obj > conf_thres) & (conf > conf_thres)
    n_gated = gate.sum(axis=-1).astype(jnp.int32)

    masked_conf = jnp.where(gate, conf, NEG_INF)
    top_conf, top_idx = jax.lax.top_k(masked_conf, k)
    xywh = jnp.take_along_axis(pred[..., :4], top_idx[..., None], axis=1)
    cx, cy = xywh[..., 0], xywh[..., 1]
    w2, h2 = xywh[..., 2] / 2, xywh[..., 3] / 2
    top_boxes = jnp.stack([cx - w2, cy - h2, cx + w2, cy + h2], axis=-1)
    top_cls = (jnp.zeros_like(top_conf) if cls is None
               else jnp.take_along_axis(cls, top_idx, axis=1))
    if agnostic or nc == 1:
        nms_boxes = top_boxes
    else:
        nms_boxes = top_boxes + (top_cls * MAX_WH)[..., None]
    valid = top_conf > NEG_INF / 2
    return top_boxes, top_conf, top_cls, nms_boxes, valid, top_idx, n_gated


def _select_kept_planar(keep, boxes, conf, cls, top_idx, pred, *,
                        nc: int, max_det: int) -> Detections:
    """Batched: first max_det kept candidates in score order, landmark
    channels gathered from `pred` for the keepers only (one flattened
    minor-dim take_along_axis, never a row gather)."""
    bs, k = keep.shape
    idx = jnp.arange(k)
    pos = jnp.where(keep, idx[None, :], k)
    neg_top, sel = jax.lax.top_k(-pos, max_det)
    sel_valid = (-neg_top) < k
    sel = jnp.where(sel_valid, sel, 0)
    take = lambda p: jnp.take_along_axis(p, sel, axis=1)
    fin_boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
    fin_conf = jnp.where(sel_valid, take(conf), 0.0)
    fin_cls = take(cls)
    fin_src = take(top_idx)  # (bs, max_det) rows into pred

    n_extra = pred.shape[-1] - (5 + nc)
    if n_extra > 0:
        # ONE packed (bs, N, E) gather (round-5 probe_gather.py: 3.0 ms
        # vs 7.0 for 15 per-channel plane gathers at the keeper shapes;
        # round 3 had only compared per-plane vs flat (bs, N*E) vs
        # K-stage — 2200/2027/1643 img/s tiny serving — and missed this)
        extras = jnp.take_along_axis(pred[..., 5 + nc:],
                                     fin_src[..., None], axis=1)
    else:
        extras = jnp.zeros((bs, max_det, 0), pred.dtype)
    return Detections(boxes=fin_boxes, scores=fin_conf, classes=fin_cls,
                      extras=extras, valid=sel_valid)


def non_max_suppression(pred: jnp.ndarray, conf_thres: float = 0.25,
                        iou_thres: float = 0.45, *, nc: int = 1,
                        nkpt: int = 5, max_candidates: int = 4096,
                        max_det: int = 300, agnostic: bool = False,
                        backend: str = "auto") -> Detections:
    """Batched on-device NMS: pred (bs, N, 5+nc+3*nkpt) -> Detections with
    leading batch dim. jit/vmap/shard_map friendly (static shapes only).

    ACCURACY KNOB — the fixed capacities: the reference NMS admits up to
    30,000 pre-NMS boxes and keeps every survivor
    (utils/general.py:518-524); this kernel truncates to the top
    `max_candidates` by confidence before suppression and returns at most
    `max_det` rows. The serving defaults (4096/300) are lossless at
    conf>=0.25; at high-recall operating points (WIDER eval conf 0.01,
    multi-scale TTA merges) crowded images can exceed them and silently
    cost recall — the eval CLIs raise them (cli/test_widerface.py uses
    16384/4096; the TTA parity test needs 16384/8192).

    backend: "xla" = the jnp suppression-matrix fixpoint; "pallas" = the
    VMEM-resident Pallas kernel (K multiple of 1024; ~2.5x faster and no
    K^2 HBM matrix at the high-recall eval operating point); "auto" picks
    pallas on TPU when K qualifies."""
    k = min(max_candidates, pred.shape[1])
    boxes, conf, cls, nms_boxes, valid, top_idx, n_gated = \
        _gather_candidates_planar(pred, nc=nc, conf_thres=conf_thres,
                                  k=k, agnostic=agnostic)

    if backend == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        backend = "pallas" if (on_tpu and k % 1024 == 0) else "xla"
    if backend == "pallas":
        from face_detection_multi_scale_tpu.ops.pallas_nms import (
            nms_keep_pallas)
        # candidates are already conf-sorted by top_k
        keep = nms_keep_pallas(nms_boxes.astype(jnp.float32), valid,
                               iou_thres)
    else:
        def keep_one(b, c):
            idx, v = nms_keep_matrix(b, c, iou_thres, b.shape[0])
            return jnp.zeros(b.shape[0], bool).at[idx].max(v)

        keep = jax.vmap(keep_one)(nms_boxes,
                                  jnp.where(valid, conf, NEG_INF))

    dets = _select_kept_planar(keep, boxes, conf, cls, top_idx, pred,
                               nc=nc, max_det=min(max_det, k))
    return dets._replace(n_gated=n_gated)


def non_max_suppression_from_raws(raws, spec, conf_thres: float,
                                  iou_thres: float, *,
                                  max_candidates: int = 2048,
                                  max_det: int = 300,
                                  backend: str = "auto") -> Detections:
    """Fast-path postprocess straight from the conv-layout head maps
    (per level (bs, ny, nx, na*no), the reshape_heads=False model output).

    Equivalent output to decode() + non_max_suppression(), computed
    planar: box/conf planes (bs, N) from strided channel slices, top-k,
    NMS, then only the final max_det keepers gather their keypoint
    channels. Candidate ordering matches decode(): level-major,
    anchor-major, raster cells.

    Benchmarked on the v5e here this is NOT faster than the standard
    path (53.5 vs 47.1 ms for tiny-face@640 b128) — XLA fuses the dense
    decode well despite the lane-padded (…, no) layout, and TPU gathers
    are expensive — so the detector keeps the standard path; this
    entry point remains as an equivalence-tested alternative for
    backends with different gather/layout tradeoffs.
    """
    na, no, nc, nkpt = spec.na, spec.no, spec.nc, spec.nkpt
    bs = raws[0].shape[0]

    # ---- stage 1: planar decode of boxes + conf for ALL anchors ----
    x1p, y1p, x2p, y2p, confp, objp = [], [], [], [], [], []
    level_meta = []  # (offset, cells, ny, nx)
    offset = 0
    sig = jax.nn.sigmoid
    for lvl, raw in enumerate(raws):
        _, ny, nx, ch = raw.shape
        cells = ny * nx
        stride = float(spec.strides[lvl])
        flat_anchors = [float(v) for row in
                        ([spec.anchors[lvl]] if not isinstance(
                            spec.anchors[lvl][0], (tuple, list))
                         else spec.anchors[lvl])
                        for v in row]
        anchors = [(flat_anchors[2 * a], flat_anchors[2 * a + 1])
                   for a in range(na)]
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0).reshape(-1)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1).reshape(-1)
        r2 = raw.reshape(bs, cells, ch)
        for a in range(na):
            t = r2[:, :, a * no: a * no + 5 + nc].astype(jnp.float32)
            obj = sig(t[:, :, 4])
            cls = sig(t[:, :, 5:5 + nc]).max(axis=-1)
            cx = (sig(t[:, :, 0]) * 2.0 - 0.5 + gx) * stride
            cy = (sig(t[:, :, 1]) * 2.0 - 0.5 + gy) * stride
            w = (sig(t[:, :, 2]) * 2.0) ** 2 * float(anchors[a][0])
            h = (sig(t[:, :, 3]) * 2.0) ** 2 * float(anchors[a][1])
            x1p.append(cx - w / 2)
            y1p.append(cy - h / 2)
            x2p.append(cx + w / 2)
            y2p.append(cy + h / 2)
            confp.append(obj * cls)
            objp.append(obj)
        level_meta.append((offset, cells, ny, nx))
        offset += na * cells
    x1 = jnp.concatenate(x1p, 1)
    y1 = jnp.concatenate(y1p, 1)
    x2 = jnp.concatenate(x2p, 1)
    y2 = jnp.concatenate(y2p, 1)
    conf = jnp.concatenate(confp, 1)
    obj = jnp.concatenate(objp, 1)

    gate = (obj > conf_thres) & (conf > conf_thres)
    masked = jnp.where(gate, conf, NEG_INF)
    k = min(max_candidates, conf.shape[1])
    top_conf, top_idx = jax.lax.top_k(masked, k)
    valid = top_conf > NEG_INF / 2

    # one packed gather (probe_gather.py round 5: 5.4x over per-plane)
    xyxy = jnp.stack([x1, y1, x2, y2], axis=-1)
    boxes = jnp.take_along_axis(xyxy, top_idx[..., None], axis=1)
    cls_ids = jnp.zeros((bs, k), jnp.float32)
    nms_boxes = boxes if nc == 1 else boxes + (cls_ids * MAX_WH)[..., None]

    # ---- stage 2: NMS over the K candidates (already conf-sorted) ----
    if backend == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        backend = "pallas" if (on_tpu and k % 1024 == 0) else "xla"
    if backend == "pallas":
        from face_detection_multi_scale_tpu.ops.pallas_nms import (
            nms_keep_pallas)
        keep = nms_keep_pallas(nms_boxes, valid, iou_thres)
    else:
        def keep_one(b, c):
            idx, v = nms_keep_matrix(b, c, iou_thres, b.shape[0])
            return jnp.zeros(b.shape[0], bool).at[idx].max(v)

        keep = jax.vmap(keep_one)(nms_boxes,
                                  jnp.where(valid, top_conf, NEG_INF))

    # ---- stage 3: select the first max_det keepers ----
    max_det = min(max_det, k)
    idx = jnp.arange(k)
    pos = jnp.where(keep, idx[None, :], k)
    neg_top, sel = jax.lax.top_k(-pos, max_det)
    sel_valid = (-neg_top) < k
    sel = jnp.where(sel_valid, sel, 0)
    take = lambda p: jnp.take_along_axis(p, sel, axis=1)
    fin_boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
    fin_conf = jnp.where(sel_valid, take(top_conf), 0.0)
    fin_idx = take(top_idx)  # (bs, max_det) indices into the full N

    # ---- stage 4: gather keypoint channels for the keepers only ----
    if nkpt:
        extras = jnp.zeros((bs, max_det, 3 * nkpt), jnp.float32)
        comp_range = jnp.arange(3 * nkpt)
        for lvl, raw in enumerate(raws):
            off, cells, ny, nx = level_meta[lvl]
            ch = raw.shape[-1]
            stride = float(spec.strides[lvl])
            local = fin_idx - off
            in_lvl = (local >= 0) & (local < na * cells)
            local = jnp.clip(local, 0, na * cells - 1)
            a_idx = local // cells
            cell = local % cells
            gy = (cell // nx).astype(jnp.float32)
            gx = (cell % nx).astype(jnp.float32)
            base = cell * ch + a_idx * no + (5 + nc)
            gidx = (base[:, :, None] + comp_range).reshape(
                bs, max_det * 3 * nkpt)
            flat = raw.reshape(bs, cells * ch)
            got = jnp.take_along_axis(flat, gidx, axis=1).reshape(
                bs, max_det, 3 * nkpt).astype(jnp.float32)
            kx = (got[:, :, 0::3] * 2.0 - 0.5 + gx[:, :, None]) * stride
            ky = (got[:, :, 1::3] * 2.0 - 0.5 + gy[:, :, None]) * stride
            kc = sig(got[:, :, 2::3])
            dec = jnp.stack([kx, ky, kc], axis=-1).reshape(
                bs, max_det, 3 * nkpt)
            extras = jnp.where(in_lvl[:, :, None], dec, extras)
    else:
        extras = jnp.zeros((bs, max_det, 0), jnp.float32)

    return Detections(boxes=fin_boxes, scores=fin_conf,
                      classes=jnp.zeros((bs, max_det), jnp.float32),
                      extras=extras, valid=sel_valid,
                      n_gated=gate.sum(axis=1).astype(jnp.int32))


def merge_nms_boxes(dets: Detections, all_boxes: jnp.ndarray,
                    all_conf: jnp.ndarray, iou_thres: float) -> Detections:
    """Merge-NMS refinement (reference utils/general.py:587-593): each
    kept box becomes the confidence-weighted mean of every candidate box
    overlapping it above the IoU threshold."""
    def one(kept_boxes, cand_boxes, cand_conf):
        iou = box_iou(kept_boxes, cand_boxes)  # (max_det, K)
        w = (iou > iou_thres) * cand_conf[None, :]
        merged = (w @ cand_boxes) / jnp.maximum(
            w.sum(axis=1, keepdims=True), 1e-9)
        return merged

    merged = jax.vmap(one)(dets.boxes, all_boxes, all_conf)
    return dets._replace(boxes=merged)


def detections_to_numpy(dets: Detections):
    """Fixed-capacity device Detections -> list of (n_i, 6+E) numpy arrays
    [x1, y1, x2, y2, conf, cls, extras...], the reference output format
    (utils/general.py:509)."""
    import numpy as np

    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    classes = np.asarray(dets.classes)
    extras = np.asarray(dets.extras)
    valid = np.asarray(dets.valid)
    out = []
    for i in range(boxes.shape[0]):
        v = valid[i]
        rows = np.concatenate([
            boxes[i][v], scores[i][v][:, None], classes[i][v][:, None],
            extras[i][v]], axis=1)
        out.append(rows)
    return out


# ---------------------------------------------------------------------------
# Multi-scale weighted NMS (the TTA merge layer)
# ---------------------------------------------------------------------------

def scale_weights(boxes: jnp.ndarray, scale_idx: jnp.ndarray,
                  num_scales: int) -> jnp.ndarray:
    """Size-vs-scale priors (reference multi_scale_face_detector.py:168-201):
    faces < 32^2 px found at the 2 largest scales x1.2; 32^2..128^2 at the
    middle scale x1.1; > 128^2 at the 2 smallest scales x1.2."""
    sizes = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    w = jnp.ones_like(sizes)
    small = sizes < 1024.0
    medium = (sizes >= 1024.0) & (sizes <= 16384.0)
    large = sizes > 16384.0
    w = jnp.where(small & (scale_idx >= num_scales - 2), w * 1.2, w)
    w = jnp.where(medium & (scale_idx == num_scales // 2), w * 1.1, w)
    w = jnp.where(large & (scale_idx <= 1), w * 1.2, w)
    return w


def weighted_nms(boxes: jnp.ndarray, conf: jnp.ndarray,
                 scale_idx: jnp.ndarray, valid: jnp.ndarray,
                 num_scales: int, iou_thres: float,
                 max_det: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-scale merge: weight confidences by the scale priors, run one
    NMS over all scales' boxes (in original-image space), and return
    (max_det,) indices into the input plus validity. The caller keeps the
    ORIGINAL (unweighted) rows of the keepers, as the reference does
    (multi_scale_face_detector.py:203-240)."""
    w = scale_weights(boxes, scale_idx, num_scales)
    weighted = jnp.where(valid, conf * w, NEG_INF)
    return nms_keep_matrix(boxes, weighted, iou_thres, max_det)


@functools.lru_cache(maxsize=None)
def _weighted_nms_exec(cap: int, num_scales: int, iou_thres: float):
    """One compiled weighted-NMS executable per (capacity, scales, thr)."""
    @jax.jit
    def run(boxes, conf, scale_idx, valid):
        return weighted_nms(boxes, conf, scale_idx, valid,
                            num_scales=num_scales, iou_thres=iou_thres,
                            max_det=cap)
    return run


def weighted_nms_merge(merged, num_scales: int, iou_thres: float):
    """Host entry point for the TTA merge: (n, >=7) numpy rows
    [x1, y1, x2, y2, conf, cls, scale_idx] -> keep indices (ascending
    score order preserved).

    Pads the candidate count to the next power-of-two bucket (min 128) so
    repeated calls with varying detection counts reuse a small, fixed set
    of compiled executables instead of retracing per distinct n — the
    framework's static-shape rule applied to the merge layer."""
    import numpy as np

    n = len(merged)
    if n == 0:
        return np.zeros((0,), np.int64)
    cap = 128
    while cap < n:
        cap *= 2
    boxes = np.zeros((cap, 4), np.float32)
    conf = np.zeros((cap,), np.float32)
    scale_idx = np.zeros((cap,), np.float32)
    valid = np.zeros((cap,), bool)
    boxes[:n] = merged[:, :4]
    conf[:n] = merged[:, 4]
    scale_idx[:n] = merged[:, 6]
    valid[:n] = True
    idx, ok = _weighted_nms_exec(cap, num_scales, float(iou_thres))(
        boxes, conf, scale_idx, valid)
    return np.asarray(idx)[np.asarray(ok)]
