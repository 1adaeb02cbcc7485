"""The graph-executing model: runs a ModelSpec's node list with
from-routing, ending in the detection head.

Equivalent role to reference models/yolo.py Model.forward_once
(models/yolo.py:376-400), but as a statically-unrolled flax module: the
node loop is Python, so XLA sees one flat graph and fuses freely.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import layers as L
from face_detection_multi_scale_tpu.models import layers_extra as LX
from face_detection_multi_scale_tpu.models.head import (
    DetectionHead, decode, reshape_level)
from face_detection_multi_scale_tpu.models.spec import (
    HEAD_OPS, ModelSpec, Node)


def resolve_act(spec: ModelSpec, node_args, default=True):
    """Effective activation for a node: a trailing string activation arg
    (tiny cfg rows) or the model-level override (models/yolo.py:502-504)."""
    if node_args and isinstance(node_args[-1], str) and \
            node_args[-1] in ("leaky", "relu", "silu", "none"):
        return node_args[-1]
    if spec.act is not None:
        return spec.act
    return default


def build_node_block(spec: ModelSpec, node: Node, dtype, name=None):
    """Instantiate the flax module for one parametric node. With
    name=None the module can be applied standalone against the node's
    own variables subtree (models/fused.py does this)."""
    op, args, d = node.op, node.args, dtype
    c1, c2 = node.c1, node.c2
    act = functools.partial(resolve_act, spec)
    if op == "Conv":
        k = args[1] if len(args) > 1 else 1
        k = tuple(int(v) for v in k) if isinstance(k, (list, tuple)) \
            else int(k)
        s = int(args[2]) if len(args) > 2 else 1
        p = args[3] if len(args) > 3 else None
        g = int(args[4]) if len(args) > 4 and not isinstance(args[4], str) else 1
        return L.ConvBN(c2, k, s, p=p, g=g, act=act(args),
                        dtype=d, name=name)
    if op == "DWConv":
        k = int(args[1]) if len(args) > 1 else 1
        s = int(args[2]) if len(args) > 2 else 1
        return L.DWConvBN(c1, c2, k, s, act=act(args), dtype=d,
                          name=name)
    if op == "SPPF":
        k = int(args[1]) if len(args) > 1 else 5
        return L.SPPF(c1, c2, k, dtype=d, name=name)
    if op == "SPPCSPC":
        return L.SPPCSPC(c2, dtype=d, name=name)
    if op == "SPPFCSPC":
        return L.SPPFCSPC(c2, dtype=d, name=name)
    if op == "SPP":
        k = tuple(args[1]) if len(args) > 1 else (3, 3, 3)
        return L.SPP(c1, c2, k, dtype=d, name=name)
    if op == "StemBlock":
        k = int(args[1]) if len(args) > 1 else 3
        s = int(args[2]) if len(args) > 2 else 2
        return L.StemBlock(c2, k, s, dtype=d, name=name)
    if op == "Shuffle_Block":
        return L.ShuffleBlock(c1, c2, int(args[1]), dtype=d, name=name)
    if op == "DWConvblock":
        return L.DWConvblock(c1, c2, int(args[1]), int(args[2]),
                             dtype=d, name=name)
    if op == "conv_bn_relu_maxpool":
        return L.ConvBnReluMaxpool(c2, dtype=d, name=name)
    if op == "Bottleneck":
        sc = bool(args[1]) if len(args) > 1 else True
        return L.Bottleneck(c1, c2, sc, act=act(args), dtype=d,
                            name=name)
    if op == "C3":
        sc = bool(args[1]) if len(args) > 1 else True
        return L.C3(c1, c2, node.repeats, sc, act=act(args),
                    dtype=d, name=name)
    if op == "BottleneckCSP":
        sc = bool(args[1]) if len(args) > 1 else True
        return L.BottleneckCSP(c1, c2, node.repeats, sc, dtype=d,
                               name=name)
    if op == "Focus":
        k = int(args[1]) if len(args) > 1 else 1
        return L.Focus(c2, k, act=act(args), dtype=d, name=name)
    if op == "ConvFocus":
        k = int(args[1]) if len(args) > 1 else 1
        return LX.ConvFocus(c1, c2, k, act=act(args), dtype=d,
                            name=name)
    if op == "CrossConv":
        k = int(args[1]) if len(args) > 1 else 3
        st = int(args[2]) if len(args) > 2 else 1
        return LX.CrossConv(c1, c2, k, st, dtype=d, name=name)
    if op == "GhostConv":
        k = int(args[1]) if len(args) > 1 else 1
        st = int(args[2]) if len(args) > 2 else 1
        return LX.GhostConv(c1, c2, k, st, act=act(args),
                            dtype=d, name=name)
    if op == "GhostBottleneck":
        k = int(args[1]) if len(args) > 1 else 3
        st = int(args[2]) if len(args) > 2 else 1
        return LX.GhostBottleneck(c1, c2, k, st, dtype=d, name=name)
    if op == "MixConv2d":
        k = tuple(args[1]) if len(args) > 1 else (1, 3)
        st = int(args[2]) if len(args) > 2 else 1
        return LX.MixConv2d(c1, c2, k, st, dtype=d, name=name)
    if op == "C3TR":
        sc = bool(args[1]) if len(args) > 1 else True
        return LX.C3TR(c1, c2, node.repeats, dtype=d, name=name)
    if op == "BottleneckCSPF":
        sc = bool(args[1]) if len(args) > 1 else True
        return LX.BottleneckCSPF(c1, c2, node.repeats, sc, dtype=d,
                                 name=name)
    if op == "BottleneckCSP2":
        return LX.BottleneckCSP2(c1, c2, node.repeats, dtype=d,
                                 name=name)
    if op == "SPPCSP":
        return LX.SPPCSP(c1, c2, dtype=d, name=name)
    raise NotImplementedError(f"op {node.op!r}")


# ops with no parameters: executed by a shared dispatch so the flax
# module graph (YoloFace) and the serving executor (models/fused.py)
# cannot diverge
STATELESS_OPS = {"Concat", "ADD", "Upsample", "ZeroPad2d", "MaxPool2d",
                 "MP", "SP", "SPF", "ReOrg", "Contract", "Expand"}


def apply_stateless_op(op: str, node: Node, inp):
    """Execute one parameter-free graph op. `inp` is the routed input
    (a list for multi-input ops)."""
    if op == "Concat":
        return jnp.concatenate(inp, axis=-1)
    if op == "ADD":
        # torch.add(x1, x2, alpha): the lite cfgs pass alpha=1
        # through parse_model's generic ADD(*args) construction
        # (models/common.py:473-481, models/yolo.py:509,527 —
        # the class default 0.5 is never used by any face cfg)
        alpha = float(node.args[0]) if node.args else 0.5
        return inp[0] + alpha * inp[1]
    if op == "Upsample":
        return L.upsample2x_nearest(inp)
    if op == "ZeroPad2d":
        # torch padding order (left, right, top, bottom)
        pl, pr, pt, pb = (int(v) for v in node.args[0])
        return jnp.pad(inp, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    if op == "MaxPool2d":
        k = int(node.args[0])
        st = int(node.args[1]) if len(node.args) > 1 else k
        pd = int(node.args[2]) if len(node.args) > 2 else 0
        return L.max_pool(inp, k, st, pd)
    if op == "MP":
        k = int(node.args[0]) if node.args else 2
        return L.max_pool(inp, k, k, 0)
    if op == "SP":
        k = int(node.args[0]) if node.args else 3
        s = int(node.args[1]) if len(node.args) > 1 else 1
        return L.max_pool(inp, k, s, k // 2)
    if op == "SPF":
        k = int(node.args[0]) if node.args else 3
        x = inp
        for _ in range((k - 1) // 2):
            x = L.max_pool(x, 3, 1, 1)
        return x
    if op == "ReOrg":
        return L.reorg(inp)
    if op == "Contract":
        return LX.contract(inp, int(node.args[0]) if node.args else 2)
    if op == "Expand":
        return LX.expand(inp, int(node.args[0]) if node.args else 2)
    raise NotImplementedError(f"stateless op {op!r}")


class YoloFace(nn.Module):
    """YOLOv7-face model over a resolved ModelSpec.

    __call__ returns the list of per-level raw maps reshaped to
    (bs, na, ny, nx, no) — the training-mode output contract of the
    reference head (models/yolo.py:273-274,308). Use
    `models.head.decode` for inference-space predictions.
    """
    spec: ModelSpec
    dtype: Any = jnp.float32

    def _build_block(self, node: Node, name: str):
        """Instantiate the flax module for one parametric node."""
        return build_node_block(self.spec, node, self.dtype, name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 reshape_heads: bool = True,
                 up_to: Optional[int] = None):
        """When reshape_heads is False, the per-level outputs stay in the
        conv layout (bs, ny, nx, na*no) — the fast-inference contract for
        ops/nms.non_max_suppression_from_raws, which avoids ever
        materializing the lane-padded (..., no) tensors.

        up_to: profiling hook — stop after node `up_to` and return a
        float32 scalar that sums the current activation AND every live
        saved tensor, so XLA cannot dead-code any node computed so far;
        per-node-range cost = delta between two truncations
        (tools/profile_layers.py)."""
        spec = self.spec.resolve()
        saved: List[Optional[jnp.ndarray]] = []
        save = set(spec.save)
        for i, node in enumerate(spec.nodes):
            # gather inputs
            if isinstance(node.f, int):
                inp = x if node.f == i - 1 else saved[node.f]
            else:
                inp = [x if j == i - 1 else saved[j] for j in node.f]

            op = node.op
            if op in HEAD_OPS:
                variant = {"Detect": "detect", "IDetect": "idetect",
                           "IKeypoint": "ikeypoint"}[op]
                raws = DetectionHead(spec, variant, dtype=self.dtype,
                                     name=f"model_{i}")(inp, train)
                if not reshape_heads:
                    return raws
                return [reshape_level(r, spec.na, spec.no) for r in raws]
            if op in STATELESS_OPS:
                x = apply_stateless_op(op, node, inp)
            elif op == "Sum":
                x = LX.Sum(len(node.f),
                           bool(node.args[1]) if len(node.args) > 1
                           else False, name=f"model_{i}")(inp)
            else:
                if node.n_resolved > 1:
                    x = inp
                    for j in range(node.n_resolved):
                        blk = self._build_block(node, f"model_{i}_{j}")
                        x = blk(x, train)
                else:
                    x = self._build_block(node, f"model_{i}")(inp, train)
            saved.append(x if i in save else None)
            if up_to is not None and i >= up_to:
                acc = x.astype(jnp.float32).sum()
                for s in saved:
                    if s is not None:
                        acc = acc + s.astype(jnp.float32).sum()
                return acc
        raise RuntimeError("spec has no detection head as its last node")


def init_model(spec: ModelSpec, key=None, img_size: int = 64,
               dtype=jnp.float32):
    """Initialize model variables with a dummy forward."""
    model = YoloFace(spec=spec, dtype=dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, img_size, img_size, 3), dtype)
    variables = model.init(key, dummy, train=False)
    return model, variables


def compute_strides(spec: ModelSpec, img_size: int = 128):
    """Derive per-level strides from a dummy forward (the reference's
    stride computation, models/yolo.py:345) and write them back into the
    spec. Needed for configs whose pyramid doesn't start at P3 (e.g.
    models/hub/yolov3-tiny.yaml is P4/P5).

    Shape-only: jax.eval_shape traces the graph abstractly, so this
    costs no FLOPs, no compile, and no device."""
    spec.resolve()
    model = YoloFace(spec=spec)
    import functools

    dummy = jnp.zeros((1, img_size, img_size, 3))
    # bind train statically — eval_shape abstracts keyword args too
    abs_vars = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.PRNGKey(0), dummy)
    raws = jax.eval_shape(
        functools.partial(model.apply, train=False), abs_vars, dummy)
    spec.strides = tuple(img_size // r.shape[2] for r in raws)
    return spec.strides


def forward_infer(model: YoloFace, variables, images: jnp.ndarray):
    """Inference forward: decoded predictions (bs, N, no) + raw maps."""
    raws = model.apply(variables, images, train=False)
    return decode(raws, model.spec), raws


def make_jitted_infer(model: YoloFace, variables):
    """A jit-compiled closure: images (bs, h, w, 3) float -> (bs, N, no)."""
    @jax.jit
    def run(variables, images):
        raws = model.apply(variables, images, train=False)
        return decode(raws, model.spec)
    return functools.partial(run, variables)
