"""W8A8 quantized inference executor (int8 weights + int8 inter-node
activations, int32 MXU accumulate, requant folded into each conv
epilogue).

Purpose: the network is HBM-bandwidth-bound at XLA's fusion level
(PERF.md roofline: w6 fwd 65 GB/batch vs an 11.1 TF MXU load), so the
one remaining single-chip forward lever is byte reduction.  Storing
every inter-node activation as int8 halves activation traffic if XLA's
TPU lowering keeps int8 tensors int8 in HBM; this module is both the
measurement prototype for that question (tools/probe_quant.py) and the
serving implementation if the answer is yes.

Scheme
------
*  Symmetric per-output-channel weight quantization:
   ``w_q = round(w_folded / s_w[c])`` with the BN already folded in
   (same fold as models/fused._conv_eff; reference BN fuse semantics
   models/yolo.py:441-449).
*  Symmetric per-tensor activation quantization with **concat-group
   unification**: every ConvBN output tensor gets a calibrated scale
   ``s_out = amax/127``; tensors that meet in a Concat/ADD share one
   scale (union-find at calibration time) so concatenation of int8
   buffers is exact.  Stateless ops (max pool, upsample, ReOrg, SPF)
   propagate the producer's scale unchanged -- max pool and nearest
   upsample commute with the (monotone, per-tensor) quantizer.
*  Each conv then executes fully fused:
       y32 = conv(x_q, w_q)            # int8 x int8 -> int32 (MXU)
       z   = act(y32 * alpha[c] + bias[c])   # f32 epilogue
       x_q' = clip(round(z * inv_out), -127, 127).astype(int8)
   with ``alpha = s_in * s_w`` precomputed, so at runtime there is no
   scale bookkeeping -- the qparams tree is pure arrays and is passed
   as a jit ARGUMENT (never closed over; CLAUDE.md relay rule).
*  The detection head (ImplicitA/M + 1x1 convs + decode,
   models/head.py) runs in the float dtype on dequantized inputs: it
   is <1% of bytes and its decode math is the parity contract.

The executor walks the same resolved ModelSpec node list as
models/model.YoloFace / models/fused.fused_apply and returns the same
per-level raw-map contract, so ops/nms and infer/detector compose
unchanged.

Supported ops: Conv, DWConv, Concat, ADD, Upsample, ReOrg, MP, SP,
SPF, MaxPool2d, SPPCSPC, SPPFCSPC, SPPF, StemBlock, Shuffle_Block,
DWConvblock, conv_bn_relu_maxpool + Detect/IDetect/IKeypoint heads --
the full op sets of all seven zoo architectures including the lite
family.  Lite notes: channel split / channel_shuffle are per-tensor
scale-preserving permutations so int8 passes through unchanged; ADD
(x1 + alpha*x2, alpha=1 in every face cfg) unifies its input scales
and requants its output to an own calibrated scale
(qparams["adds"]).  Unsupported ops raise NotImplementedError.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from face_detection_multi_scale_tpu.models import model as M
from face_detection_multi_scale_tpu.models import layers as L
from face_detection_multi_scale_tpu.models.head import (
    DetectionHead, reshape_level)
from face_detection_multi_scale_tpu.models.spec import (
    HEAD_OPS, ModelSpec, Node)

BN_EPS = 1e-3  # models/layers.py BatchNorm epsilon


# ---------------------------------------------------------------------------
# BN folding on a params subtree
# ---------------------------------------------------------------------------

def fold_convbn(params, stats) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Effective (kernel HWIO f32, bias f32) of one ConvBN subtree
    {"conv": .., "bn": ..} with the BN folded (exact for both raw and
    models/fuse.fold_bn-prefolded variables)."""
    kern = params["conv"]["kernel"].astype(jnp.float32)
    scale = params["bn"]["scale"].astype(jnp.float32)
    beta = params["bn"]["bias"].astype(jnp.float32)
    if stats is not None and "bn" in stats:
        mean = stats["bn"]["mean"].astype(jnp.float32)
        var = stats["bn"]["var"].astype(jnp.float32)
    else:
        mean = jnp.zeros_like(scale)
        var = jnp.full_like(scale, 1.0 - BN_EPS)
    g = scale * jax.lax.rsqrt(var + BN_EPS)
    return kern * g, beta - mean * g


def _act_apply(act: str, x):
    if act in ("silu", True):
        return jax.nn.silu(x)
    if act == "leaky":
        return jax.nn.leaky_relu(x, negative_slope=0.1)
    if act == "relu":
        return jax.nn.relu(x)
    if act in ("none", False, None):
        return x
    raise NotImplementedError(f"activation {act!r}")


@dataclasses.dataclass(frozen=True)
class ConvDesc:
    """Static description of one ConvBN application inside the graph."""
    tag: str          # unique id, e.g. "model_12" or "model_47/cv3"
    k: Tuple[int, int]
    s: int
    pads: Tuple[Tuple[int, int], Tuple[int, int]]
    groups: int
    act: str


def _conv_desc(tag: str, k, s: int, p, g: int, act) -> ConvDesc:
    kk = tuple(int(v) for v in k) if isinstance(k, (tuple, list)) \
        else (int(k), int(k))
    if p is None:
        pads = tuple((v // 2, v // 2) for v in kk)
    elif isinstance(p, (tuple, list)):
        pads = tuple((int(v), int(v)) for v in p)
    else:
        pads = ((int(p), int(p)),) * 2
    if act is True:
        act = "silu"
    return ConvDesc(tag, kk, int(s), pads, int(g), act)


# ---------------------------------------------------------------------------
# the shared graph walker
# ---------------------------------------------------------------------------

# value flowing through the walk: (array, producing-scale tag)
Value = Tuple[jnp.ndarray, str]


def _node_act(spec: ModelSpec, node: Node) -> str:
    act = M.resolve_act(spec, node.args)
    return "silu" if act is True else str(act)


def _walk(spec: ModelSpec, x: Value,
          conv: Callable[[ConvDesc, Value], Value],
          head: Callable[[int, Node, List[Value]], Any],
          on_concat: Optional[Callable[[List[str]], str]] = None,
          add: Optional[Callable[[int, float, List[Value]], Value]] = None):
    """Run the resolved node list with from-routing, dispatching every
    ConvBN through `conv` and the final head through `head`.  Composite
    SPP / lite blocks are inlined so their internal tensors are
    first-class quantization points.  `on_concat` unifies scale groups
    (calibration) or picks the representative tag (quantized run).
    `add` handles the ADD node (i, alpha, inputs) -> Value; it owns the
    requant since a sum exceeds the shared input scale's int8 range."""
    spec = spec.resolve()
    nodes = spec.nodes
    save = set(spec.save)
    saved: List[Optional[Value]] = []
    if on_concat is None:
        on_concat = lambda tags: tags[0]  # noqa: E731

    def cat(vals: List[Value]) -> Value:
        tag = on_concat([t for _, t in vals])
        return jnp.concatenate([a for a, _ in vals], axis=-1), tag

    def conv_args(node: Node, tag: str) -> ConvDesc:
        a = node.args
        k = a[1] if len(a) > 1 else 1
        s = int(a[2]) if len(a) > 2 else 1
        p = a[3] if len(a) > 3 else None
        g = int(a[4]) if len(a) > 4 and not isinstance(a[4], str) else 1
        return _conv_desc(tag, k, s, p, g, _node_act(spec, node))

    def spp_csp(node: Node, i: int, v: Value, fast: bool) -> Value:
        # SPPFCSPC (models/common.py:314-333) / SPPCSPC (:294-312)
        c2 = int(node.args[0])
        act = _node_act(spec, node)
        t = f"model_{i}"
        cv = lambda n, k, w: conv(  # noqa: E731
            _conv_desc(f"{t}/{n}", k, 1, None, 1, act), w)
        x1 = cv("cv1", 1, v)
        x1 = cv("cv3", 3, x1)
        x1 = cv("cv4", 1, x1)
        if fast:
            k = 5
            p2 = (L.max_pool(x1[0], k, 1, k // 2), x1[1])
            p3 = (L.max_pool(p2[0], k, 1, k // 2), p2[1])
            p4 = (L.max_pool(p3[0], k, 1, k // 2), p3[1])
            y1 = cat([x1, p2, p3, p4])
        else:
            pools = [(L.max_pool(x1[0], k, 1, k // 2), x1[1])
                     for k in (5, 9, 13)]
            y1 = cat([x1] + pools)
        y1 = cv("cv5", 1, y1)
        y1 = cv("cv6", 3, y1)
        y2 = cv("cv2", 1, v)
        out = cat([y1, y2])
        return cv("cv7", 1, out)

    def sppf(node: Node, i: int, v: Value) -> Value:
        # SPPF (models/common.py:335-348)
        k = int(node.args[1]) if len(node.args) > 1 else 5
        act = _node_act(spec, node)
        t = f"model_{i}"
        x1 = conv(_conv_desc(f"{t}/cv1", 1, 1, None, 1, act), v)
        y1 = (L.max_pool(x1[0], k, 1, k // 2), x1[1])
        y2 = (L.max_pool(y1[0], k, 1, k // 2), y1[1])
        y3 = (L.max_pool(y2[0], k, 1, k // 2), y2[1])
        out = cat([x1, y1, y2, y3])
        return conv(_conv_desc(f"{t}/cv2", 1, 1, None, 1, act), out)

    def stem(node: Node, t: str, v: Value) -> Value:
        # StemBlock (models/common.py:422-437; models/layers.py)
        k = int(node.args[1]) if len(node.args) > 1 else 3
        s = int(node.args[2]) if len(node.args) > 2 else 2
        s1 = conv(_conv_desc(f"{t}/stem_1", k, s, None, 1, "silu"), v)
        s2a = conv(_conv_desc(f"{t}/stem_2a", 1, 1, 0, 1, "silu"), s1)
        s2b = conv(_conv_desc(f"{t}/stem_2b", 3, 2, 1, 1, "silu"), s2a)
        s2p = (L.max_pool(s1[0], 2, 2, 0, ceil_mode=True), s1[1])
        out = cat([s2b, s2p])
        return conv(_conv_desc(f"{t}/stem_3", 1, 1, 0, 1, "silu"), out)

    def shuffle(node: Node, t: str, v: Value) -> Value:
        # ShuffleNetV2 unit (models/common.py:494-539): split/shuffle
        # are per-tensor-scale-preserving channel permutations
        c1, c2 = node.c1, node.c2
        stride = int(node.args[1])
        bf = c2 // 2
        if stride > 1:
            b1 = conv(_conv_desc(f"{t}@branch1_0,branch1_1", 3, stride,
                                 1, c1, "none"), v)
            b1 = conv(_conv_desc(f"{t}@branch1_2,branch1_3", 1, 1, 0, 1,
                                 "silu"), b1)
            x2 = v
        else:
            b1 = (v[0][..., :bf], v[1])
            x2 = (v[0][..., bf:], v[1])
        b2 = conv(_conv_desc(f"{t}@branch2_0,branch2_1", 1, 1, 0, 1,
                             "silu"), x2)
        b2 = conv(_conv_desc(f"{t}@branch2_3,branch2_4", 3, stride, 1,
                             bf, "none"), b2)
        b2 = conv(_conv_desc(f"{t}@branch2_5,branch2_6", 1, 1, 0, 1,
                             "silu"), b2)
        out = cat([b1, b2])
        return (L.channel_shuffle(out[0], 2), out[1])

    def dwblock(node: Node, t: str, v: Value) -> Value:
        # DWConvblock (models/common.py:452-471): dw k x k then pw 1x1
        k = int(node.args[1])
        s = int(node.args[2])
        v = conv(_conv_desc(f"{t}@conv1,bn1", k, s, k // 2, node.c1,
                            "silu"), v)
        return conv(_conv_desc(f"{t}@conv2,bn2", 1, 1, 0, 1, "silu"), v)

    def cbrm(node: Node, t: str, v: Value) -> Value:
        # conv_bn_relu_maxpool (models/common.py:439-450): despite the
        # reference name the activation is silu (models/layers.py)
        v = conv(_conv_desc(f"{t}@conv_0,conv_1", 3, 2, 1, 1, "silu"), v)
        return (L.max_pool(v[0], 3, 2, 1), v[1])

    LITE_BLOCKS = {"StemBlock": stem, "Shuffle_Block": shuffle,
                   "DWConvblock": dwblock, "conv_bn_relu_maxpool": cbrm}

    for i, node in enumerate(nodes):
        if isinstance(node.f, int):
            inp = x if node.f == i - 1 else saved[node.f]
        else:
            inp = [x if j == i - 1 else saved[j] for j in node.f]

        op = node.op
        if op in HEAD_OPS:
            return head(i, node, inp)
        if op == "Conv":
            reps = node.n_resolved
            if reps > 1:
                v = inp
                for j in range(reps):
                    v = conv(conv_args(node, f"model_{i}_{j}"), v)
                x = v
            else:
                x = conv(conv_args(node, f"model_{i}"), inp)
        elif op == "DWConv":
            import math as _m
            k = int(node.args[1]) if len(node.args) > 1 else 1
            s = int(node.args[2]) if len(node.args) > 2 else 1
            g = _m.gcd(node.c1, node.c2)
            x = conv(_conv_desc(f"model_{i}", k, s, None, g,
                                _node_act(spec, node)), inp)
        elif op == "Concat":
            x = cat(inp)
        elif op == "ADD":
            alpha = float(node.args[0]) if node.args else 0.5
            if add is None:
                raise NotImplementedError(
                    "ADD requires the walk's `add` callback")
            x = add(i, alpha, inp)
        elif op == "Upsample":
            x = (L.upsample2x_nearest(inp[0]), inp[1])
        elif op == "ReOrg":
            x = (L.reorg(inp[0]), inp[1])
        elif op in ("MP", "SP", "SPF", "MaxPool2d"):
            arr = M.apply_stateless_op(op, node, inp[0])
            x = (arr, inp[1])
        elif op == "SPPCSPC":
            x = spp_csp(node, i, inp, fast=False)
        elif op == "SPPFCSPC":
            x = spp_csp(node, i, inp, fast=True)
        elif op == "SPPF":
            x = sppf(node, i, inp)
        elif op in LITE_BLOCKS:
            # repeated blocks expand to model_{i}_{j} param subtrees
            # (model.py's n_resolved semantics, e.g. lite's stacked
            # stride-1 Shuffle_Blocks)
            reps = node.n_resolved
            v = inp
            for j in range(reps):
                base = f"model_{i}_{j}" if reps > 1 else f"model_{i}"
                v = LITE_BLOCKS[op](node, base, v)
            x = v
        else:
            raise NotImplementedError(
                f"quantized executor does not support op {op!r}")
        saved.append(x if i in save else None)
    raise RuntimeError("spec has no detection head as its last node")


def _subtree(variables, tag: str):
    """(params, batch_stats|None) subtree for a slash-joined tag."""
    from collections.abc import Mapping
    p = variables["params"]
    s = variables.get("batch_stats")
    for part in tag.split("/"):
        p = p[part]
        s = s.get(part) if isinstance(s, Mapping) else None
    return p, s


def fold_by_tag(variables, tag: str):
    """Effective (kernel, bias) for a conv tag.  Two addressing forms:
    "model_3/cv1" names a ConvBN module subtree ({"conv", "bn"});
    "model_3@conv1,bn1" names raw nn.Conv / nn.BatchNorm leaf pairs
    (the lite blocks -- DWConvblock, ShuffleBlock, ConvBnReluMaxpool --
    declare their leaves directly, reference models/common.py:452-539)."""
    from collections.abc import Mapping
    if "@" in tag:
        base, pair = tag.split("@")
        ck, bk = pair.split(",")
        p, s = _subtree(variables, base)
        return fold_convbn(
            {"conv": p[ck], "bn": p[bk]},
            {"bn": s[bk]} if isinstance(s, Mapping) and bk in s else None)
    p, s = _subtree(variables, tag)
    return fold_convbn(p, s)


def _run_conv_f32(desc: ConvDesc, x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (desc.s, desc.s), list(desc.pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=desc.groups)
    return _act_apply(desc.act, y + b.reshape(1, 1, 1, -1))


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

class _Unify:
    """Union-find over scale tags."""

    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, t: str) -> str:
        self.parent.setdefault(t, t)
        while self.parent[t] != t:
            self.parent[t] = self.parent[self.parent[t]]
            t = self.parent[t]
        return t

    def union(self, tags: Sequence[str]) -> str:
        root = self.find(tags[0])
        for t in tags[1:]:
            self.parent[self.find(t)] = root
        return root


@dataclasses.dataclass
class CalibResult:
    amax: Dict[str, float]          # per-tag activation |max| (grouped)
    in_tag: Dict[str, str]          # conv tag -> its input's scale tag
    groups: _Unify                  # tag unification
    head_in_tags: Tuple[str, ...]   # scale tags feeding the head
    add_in: Dict[str, str] = dataclasses.field(default_factory=dict)
    # ADD tag ("model_i.add") -> its (unified) input scale tag


def calibrate(spec: ModelSpec, variables,
              x_calib: jnp.ndarray) -> CalibResult:
    """Float forward over calibration images recording per-tensor amax.

    The walk is traced once (jit) returning a stacked amax vector; tag
    structure/unification happens at trace time in Python.  `x_calib`
    is (b, h, w, 3) float in [0, 1]."""
    spec = spec.resolve()
    uf = _Unify()
    order: List[str] = []
    in_tag: Dict[str, str] = {}
    add_in: Dict[str, str] = {}
    head_tags: List[str] = []

    def traced(v, x):
        stats: List[jnp.ndarray] = []

        def conv(desc: ConvDesc, val: Value) -> Value:
            arr, src = val
            w, b = fold_by_tag(v, desc.tag)
            y = _run_conv_f32(desc, arr.astype(jnp.float32), w, b)
            in_tag[desc.tag] = src
            order.append(desc.tag)
            stats.append(jnp.max(jnp.abs(y)).astype(jnp.float32))
            return (y, desc.tag)

        def add(i, alpha, vals):
            src = uf.union([t for _, t in vals])
            y = vals[0][0].astype(jnp.float32) \
                + alpha * vals[1][0].astype(jnp.float32)
            t = f"model_{i}.add"
            add_in[t] = src
            order.append(t)
            stats.append(jnp.max(jnp.abs(y)).astype(jnp.float32))
            return (y, t)

        def head(i, node, inp):
            head_tags.extend(t for _, t in inp)
            return jnp.stack(stats)

        return _walk(spec, (x.astype(jnp.float32), "in"), conv, head,
                     on_concat=lambda tags: uf.union(tags), add=add)

    amaxes = np.asarray(jax.jit(traced)(variables, x_calib))
    res = CalibResult(amax={}, in_tag=in_tag, groups=uf,
                      head_in_tags=tuple(head_tags), add_in=add_in)
    # group-max over unified tags; "in" is the fixed input scale point
    grouped: Dict[str, float] = {}
    for t, v in zip(order, amaxes):
        r = uf.find(t)
        grouped[r] = max(grouped.get(r, 0.0), float(v))
    for t in order:
        res.amax[t] = grouped[uf.find(t)]
    return res


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------

S_IN = 1.0 / 127.0  # input image scale: x in [0,1] -> x_q = round(127 x)


def quantize(spec: ModelSpec, variables, calib: CalibResult) -> Dict:
    """Build the runtime qparams tree (pure arrays, jit-argument-safe).

    Layout: {"convs": {tag: {"w": int8 HWIO, "alpha": f32 (C,),
    "bias": f32 (C,), "inv_out": f32 ()}}, "head": <float head vars>,
    "head_scales": f32 (n_levels,)}"""
    spec = spec.resolve()
    convs: Dict[str, Dict[str, jnp.ndarray]] = {}

    def s_of(tag: str) -> float:
        if tag == "in":
            return S_IN
        return max(calib.amax[tag], 1e-12) / 127.0

    for tag, src in calib.in_tag.items():
        w, b = fold_by_tag(variables, tag)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        s_in = s_of(src)
        convs[tag] = {
            "w": w_q,
            "alpha": (s_w * s_in).astype(jnp.float32),
            "bias": b.astype(jnp.float32),
            "inv_out": jnp.float32(1.0 / s_of(tag)),
        }

    # head runs float on dequantized inputs
    head_idx = len(spec.nodes) - 1
    head_vars = {col: {f"model_{head_idx}":
                       tree[f"model_{head_idx}"]}
                 for col, tree in variables.items()
                 if f"model_{head_idx}" in tree}
    head_scales = jnp.asarray([s_of(t) for t in calib.head_in_tags],
                              jnp.float32)
    # ADD outputs requant from the unified input scale to their own
    adds = {t: jnp.float32(s_of(src) / s_of(t))
            for t, src in calib.add_in.items()}
    return {"convs": convs, "adds": adds, "head": head_vars,
            "head_scales": head_scales}


# ---------------------------------------------------------------------------
# quantized forward
# ---------------------------------------------------------------------------

def quant_apply(spec: ModelSpec, qparams: Dict, x: jnp.ndarray,
                reshape_heads: bool = True, dtype=jnp.bfloat16):
    """W8A8 forward.  `x` is (b, h, w, 3) float in [0, 1] (or uint8
    0..255, divided here); returns the per-level raw maps in `dtype`
    with the same contract as YoloFace.__call__ / fused_apply."""
    spec = spec.resolve()
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0),
                   -127, 127).astype(jnp.int8)
    convs = qparams["convs"]

    def conv(desc: ConvDesc, v: Value) -> Value:
        arr, _ = v
        q = convs[desc.tag]
        y32 = jax.lax.conv_general_dilated(
            arr, q["w"], (desc.s, desc.s), list(desc.pads),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=desc.groups,
            preferred_element_type=jnp.int32)
        yf = y32.astype(jnp.float32) * q["alpha"].reshape(1, 1, 1, -1) \
            + q["bias"].reshape(1, 1, 1, -1)
        z = _act_apply(desc.act, yf)
        zq = jnp.clip(jnp.round(z * q["inv_out"]), -127, 127)
        return (zq.astype(jnp.int8), desc.tag)

    def add(i, alpha, vals):
        # inputs share one scale (calibration unified them); the sum is
        # requanted to its own calibrated scale by the precomputed ratio
        t = f"model_{i}.add"
        y = (vals[0][0].astype(jnp.float32)
             + jnp.float32(alpha) * vals[1][0].astype(jnp.float32)) \
            * qparams["adds"][t]
        return (jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8), t)

    def head(i, node, inp):
        scales = qparams["head_scales"]
        xs = [(arr.astype(dtype) * scales[j].astype(dtype))
              for j, (arr, _) in enumerate(inp)]
        variant = {"Detect": "detect", "IDetect": "idetect",
                   "IKeypoint": "ikeypoint"}[node.op]
        mod = DetectionHead(spec, variant, dtype=dtype)
        raws = mod.apply(
            {col: tree[f"model_{i}"]
             for col, tree in qparams["head"].items()}, xs, train=False)
        if not reshape_heads:
            return raws
        return [reshape_level(r, spec.na, spec.no) for r in raws]

    return _walk(spec, (x_q, "in"), conv, head, add=add)


def quantize_model(spec: ModelSpec, variables, x_calib: jnp.ndarray):
    """Calibrate + quantize in one step; returns the qparams tree."""
    return quantize(spec, variables, calibrate(spec, variables, x_calib))


def calibrate_shape_only(spec: ModelSpec, variables,
                         img_size: int = 64) -> CalibResult:
    """Structure-only calibration: collects the tag graph (in_tag map,
    concat unification, head tags) via an abstract trace — no compute,
    no device — and sets every amax to 1.0.  Scales are then arbitrary
    but structurally valid: use for performance measurement
    (tools/probe_quant.py), never for accuracy."""
    spec = spec.resolve()
    uf = _Unify()
    order: List[str] = []
    in_tag: Dict[str, str] = {}
    add_in: Dict[str, str] = {}
    head_tags: List[str] = []

    def traced(v, x):
        def conv(desc: ConvDesc, val: Value) -> Value:
            arr, src = val
            w, b = fold_by_tag(v, desc.tag)
            y = _run_conv_f32(desc, arr.astype(jnp.float32), w, b)
            in_tag[desc.tag] = src
            order.append(desc.tag)
            return (y, desc.tag)

        def add(i, alpha, vals):
            src = uf.union([t for _, t in vals])
            y = vals[0][0].astype(jnp.float32) \
                + alpha * vals[1][0].astype(jnp.float32)
            t = f"model_{i}.add"
            add_in[t] = src
            order.append(t)
            return (y, t)

        def head(i, node, inp):
            head_tags.extend(t for _, t in inp)
            return jnp.zeros(())

        return _walk(spec, (x.astype(jnp.float32), "in"), conv, head,
                     on_concat=lambda tags: uf.union(tags), add=add)

    x = jax.ShapeDtypeStruct((1, img_size, img_size, 3), jnp.float32)
    jax.eval_shape(traced, variables, x)
    return CalibResult(amax={t: 1.0 for t in order}, in_tag=in_tag,
                       groups=uf, head_in_tags=tuple(head_tags),
                       add_in=add_in)
