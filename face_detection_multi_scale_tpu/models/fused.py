"""Serving-graph executor with fused-ELAN Pallas blocks.

The flax module graph (models/model.YoloFace) is the training/parity
truth; this module is the SERVING path: it walks the same resolved node
list reading the same variables pytree, but executes whole E-ELAN
groups (two 1x1 branches + a 3x3 chain + concat + 1x1 transition —
reference cfg/yolov7-w6.yaml backbone/head groups) as single Pallas
kernels that keep every intermediate in VMEM (ops/pallas_elan.py).
Everything outside a fused group runs through exactly the same flax
modules, applied standalone against their own subtree, so the two paths
cannot diverge op-wise and XLA still sees one flat jitted graph.

Pattern contract (find_elan_blocks): a Concat of >=3 tensors whose
members are exactly {the two sibling 1x1 convs, some of a consecutive
3x3 chain hanging off one of them}, followed by a 1x1 transition conv,
with a uniform supported activation, stride 1, groups 1, and no
intermediate consumed outside the group.  Blocks whose VMEM working set
does not fit (ops/pallas_elan.choose_strip_height) stay unfused.

Inference only: the fused kernel has no VJP; training always uses the
flax graph.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import model as M
from face_detection_multi_scale_tpu.models.head import (
    DetectionHead, reshape_level)
from face_detection_multi_scale_tpu.models.spec import (
    HEAD_OPS, ModelSpec, Node)
from face_detection_multi_scale_tpu.ops import pallas_elan as PE

BN_EPS = 1e-3  # models/layers.py BatchNorm epsilon


def apply_variant(shape: PE.ElanShape, expr: str) -> PE.ElanShape:
    """Apply a "+"-joined kernel-variant expression to an ElanShape.

    Grammar (shared by tools/bench_elan and the serving path):
    taps | flat | im2col | im2col9 | ab | ct | nopad | gN, plus the
    perf-ablation parts relu / nomask (numerics intentionally wrong —
    bench only).  Legacy "flat_im2col" is accepted.
    """
    shp = shape
    for part in expr.replace("flat_im2col", "flat+im2col").split("+"):
        if part == "taps":
            pass
        elif part == "im2col":
            shp = dataclasses.replace(shp, im2col=True)
        elif part == "flat":
            shp = dataclasses.replace(shp, flat_mm=True)
        elif part == "im2col9":
            shp = dataclasses.replace(shp, flat_mm=True, im2col9=True)
        elif part == "ab":
            shp = dataclasses.replace(shp, pack_ab=True)
        elif part == "ct":
            shp = dataclasses.replace(shp, flat_mm=True,
                                      concat_trans=True)
        elif part == "nopad":
            shp = dataclasses.replace(shp, host_pad=False)
        elif part.startswith("g") and part[1:].isdigit():
            shp = dataclasses.replace(shp, flat_mm=True,
                                      group=int(part[1:]))
        elif part.startswith("b") and part[1:].isdigit():
            shp = dataclasses.replace(shp,
                                      vmem_budget_mb=int(part[1:]))
        elif part == "relu":
            shp = dataclasses.replace(shp, act="relu")
        elif part == "nomask":
            shp = dataclasses.replace(shp, debug_skip_mask=True)
        else:
            raise ValueError(f"unknown fused-ELAN variant part {part!r}")
    return shp


@dataclasses.dataclass(frozen=True)
class ElanBlock:
    """One fusable ELAN group located in a spec's node list."""
    a: int                    # route 1x1 conv node index
    b: int                    # chain-input 1x1 conv node index
    chain: Tuple[int, ...]    # consecutive 3x3 conv node indices
    concat: int               # Concat node index
    trans: int                # transition 1x1 conv node index
    shape: PE.ElanShape
    pre: Optional[int] = None  # absorbed 3x3 feed conv (backbone
    #                            downsample), when shape.has_pre

    @property
    def start(self) -> int:
        first = min(self.a, self.b)
        return self.pre if self.pre is not None else first

    @property
    def nodes(self) -> Tuple[int, ...]:
        extra = {self.pre} if self.pre is not None else set()
        return tuple(sorted({self.a, self.b, *self.chain,
                             self.concat, self.trans} | extra))


def _norm_f(nodes: Sequence[Node], i: int) -> List[int]:
    f = nodes[i].f
    fs = [f] if isinstance(f, int) else list(f)
    return [i - 1 if s == -1 else s for s in fs]


def _act_name(spec: ModelSpec, node: Node) -> str:
    act = M.resolve_act(spec, node.args)
    return "silu" if act is True else str(act)


def _is_conv(node: Node, k: int, stride: int = 1) -> bool:
    if node.op != "Conv" or node.n_resolved != 1:
        return False
    args = node.args
    kk = args[1] if len(args) > 1 else 1
    if isinstance(kk, (list, tuple)):
        return False
    s = int(args[2]) if len(args) > 2 else 1
    p = args[3] if len(args) > 3 else None
    g = int(args[4]) if len(args) > 4 and not isinstance(args[4], str) else 1
    return int(kk) == k and s == stride and g == 1 and p is None


def find_elan_blocks(spec: ModelSpec,
                     absorb_pre: bool = False) -> List[ElanBlock]:
    """Locate every fusable ELAN group in a resolved spec.

    With `absorb_pre`, a 3x3 stride-1/2 Conv that feeds ONLY the
    group's two 1x1s (the backbone downsample preceding each E-ELAN,
    reference cfg/yolov7-w6.yaml rows 14/23/32/41) is absorbed into the
    kernel, removing its HBM write+read."""
    spec = spec.resolve()
    nodes = spec.nodes
    consumers: Dict[int, set] = {i: set() for i in range(len(nodes))}
    for i in range(len(nodes)):
        for s in _norm_f(nodes, i):
            if s >= 0:
                consumers[s].add(i)

    blocks: List[ElanBlock] = []
    for k, node in enumerate(nodes):
        if node.op != "Concat" or isinstance(node.f, int):
            continue
        mem = [m if m >= 0 else k + m for m in node.f]
        if len(mem) < 3 or len(set(mem)) != len(mem) or k + 1 >= len(nodes):
            continue
        tr = nodes[k + 1]
        if not _is_conv(tr, 1) or _norm_f(nodes, k + 1) != [k]:
            continue
        srt = sorted(set(mem))
        a, b = srt[0], srt[1]
        if b != a + 1:
            continue
        if not (_is_conv(nodes[a], 1) and _is_conv(nodes[b], 1)):
            continue
        fa, fb = _norm_f(nodes, a), _norm_f(nodes, b)
        if fa != fb or len(fa) != 1:
            continue
        # the 3x3 chain hangs off one of the two 1x1s
        j = b + 1
        chain: List[int] = []
        prev_candidates = {a, b}
        chain_src: Optional[int] = None
        while j < k and _is_conv(nodes[j], 3):
            src = _norm_f(nodes, j)
            if len(src) != 1:
                break
            if not chain:
                if src[0] not in prev_candidates:
                    break
                chain_src = src[0]
            elif src[0] != chain[-1]:
                break
            chain.append(j)
            j += 1
        if not chain or chain_src is None:
            continue
        route = a if chain_src == b else b
        if set(mem) - ({a, b} | set(chain)):
            continue
        # uniform, supported activation across the whole group
        acts = {_act_name(spec, nodes[i]) for i in (a, b, *chain, k + 1)}
        if len(acts) != 1 or acts.pop() not in ("silu", "leaky", "relu"):
            continue
        # nothing outside the group may read an intermediate
        ok = consumers[route] <= {k}
        ok &= consumers[chain_src] <= {chain[0], k}
        for idx, c in enumerate(chain):
            allowed = {k} | ({chain[idx + 1]} if idx + 1 < len(chain)
                             else set())
            ok &= consumers[c] <= allowed
        ok &= consumers[k] == {k + 1}
        if not ok:
            continue
        ccv = nodes[a].c2
        if nodes[b].c2 != ccv:
            continue
        cch = nodes[chain[0]].c2
        if any(nodes[c].c2 != cch for c in chain):
            continue

        def mname(i: int) -> str:
            if i == route:
                return "a"
            if i == chain_src:
                return "b"
            return f"y{chain.index(i) + 1}"

        pre: Optional[int] = None
        pre_cin, pre_stride = 0, 1
        if absorb_pre:
            src = fa[0]
            if (0 <= src == a - 1  # directly precedes: whole group is
                    # then one contiguous node run for the executor
                    and (_is_conv(nodes[src], 3, 2)
                         or _is_conv(nodes[src], 3, 1))
                    and consumers[src] == {a, b}
                    and _act_name(spec, nodes[src]) ==
                    _act_name(spec, nodes[a])):
                pre = src
                pre_cin = nodes[src].c1
                pre_stride = int(nodes[src].args[2]) \
                    if len(nodes[src].args) > 2 else 1
        shape = PE.ElanShape(
            cin=nodes[a].c1, ccv=ccv, cch=cch, cout=nodes[k + 1].c2,
            n_chain=len(chain), members=tuple(mname(m) for m in mem),
            act=_act_name(spec, nodes[a]),
            pre_cin=pre_cin, pre_stride=pre_stride)
        blocks.append(ElanBlock(a=route, b=chain_src, chain=tuple(chain),
                                concat=k, trans=k + 1, shape=shape,
                                pre=pre))
    return blocks


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------

def _conv_eff(variables, idx: int, dtype):
    """Effective (kernel, bias) of ConvBN node `idx` with the BN folded:
    w' = w * gamma/sqrt(var+eps), b' = beta - mu * gamma/sqrt(var+eps)
    (models/fuse.py semantics; exact for both raw and pre-folded
    variables since fold_bn rewrites BN to scale=1, var=1-eps, mean=0)."""
    name = f"model_{idx}"
    p = variables["params"][name]
    kern = p["conv"]["kernel"].astype(jnp.float32)
    scale = p["bn"]["scale"].astype(jnp.float32)
    beta = p["bn"]["bias"].astype(jnp.float32)
    stats = variables.get("batch_stats", {})
    if name in stats:
        mean = stats[name]["bn"]["mean"].astype(jnp.float32)
        var = stats[name]["bn"]["var"].astype(jnp.float32)
    else:  # already-folded weights exported without batch_stats
        mean = jnp.zeros_like(scale)
        var = jnp.full_like(scale, 1.0 - BN_EPS)
    g = scale * jax.lax.rsqrt(var + BN_EPS)
    bias = beta - mean * g
    return (kern * g).astype(dtype), bias.reshape(1, -1)


def pack_elan_weights(variables, block: ElanBlock, dtype):
    """Flat weight list for ops/pallas_elan.fused_elan."""
    ws: List[jnp.ndarray] = []
    if block.pre is not None:
        k, bias = _conv_eff(variables, block.pre, dtype)
        ws += [k, bias]
    for idx in (block.a, block.b):
        k, bias = _conv_eff(variables, idx, dtype)
        ws += [k.reshape(k.shape[2], k.shape[3]), bias]
    for idx in block.chain:
        k, bias = _conv_eff(variables, idx, dtype)
        ws += [k, bias]
    k, bias = _conv_eff(variables, block.trans, dtype)
    ws += [k.reshape(k.shape[2], k.shape[3]), bias]
    return ws


# ---------------------------------------------------------------------------
# the executor
# ---------------------------------------------------------------------------

def _subvars(variables, name: str):
    out = {}
    for col, tree in variables.items():
        if name in tree:
            out[col] = tree[name]
    return out


def fused_apply(spec: ModelSpec, variables, x: jnp.ndarray,
                blocks: Optional[Sequence[ElanBlock]] = None,
                dtype=None, reshape_heads: bool = True,
                interpret=None):
    """Inference forward matching YoloFace.__call__(train=False), with
    the given ELAN blocks executed as fused Pallas kernels.

    `blocks=None` fuses every block found in the spec that fits VMEM;
    pass `blocks=[]` for a pure flax-modules-per-node execution (used
    by tests to prove the two paths are identical)."""
    spec = spec.resolve()
    if dtype is None:
        dtype = x.dtype
    if blocks is None:
        blocks = find_elan_blocks(spec)
    by_start = {}
    for blk in blocks:
        by_start[blk.start] = blk
        if blk.pre is not None:
            # if the absorbed variant doesn't fit VMEM, the pre conv
            # runs as a normal node and the group still fuses bare
            alt = dataclasses.replace(
                blk, pre=None,
                shape=dataclasses.replace(blk.shape, pre_cin=0,
                                          pre_stride=1))
            by_start.setdefault(alt.start, alt)

    saved: List[Optional[jnp.ndarray]] = []
    save = set(spec.save)
    i = 0
    nodes = spec.nodes
    while i < len(nodes):
        blk = by_start.get(i)
        if blk is not None:
            feed = blk.pre if blk.pre is not None else blk.a
            src = _norm_f(nodes, feed)[0]
            inp = saved[src] if saved[src] is not None else x
            s = blk.shape.pre_stride if blk.shape.has_pre else 1
            gh, gw = inp.shape[1] // s, inp.shape[2] // s
            th = PE.choose_strip_height(
                blk.shape, gh, gw, inp.dtype.itemsize)
            if (th > 0 and gh % th == 0 and inp.shape[1] % s == 0
                    and inp.shape[2] % s == 0):
                ws = pack_elan_weights(variables, blk, inp.dtype)
                out = PE.fused_elan(inp, ws, blk.shape, th=th,
                                    interpret=interpret)
                while i < blk.trans:
                    saved.append(None)
                    i += 1
                x = out
                saved.append(x if i in save else None)
                i += 1
                continue
            # does not fit VMEM at this resolution: run unfused

        node = nodes[i]
        if isinstance(node.f, int):
            fn = i - 1 if node.f == -1 else node.f
            inp = x if fn == i - 1 else saved[fn]
        else:
            inp = [x if (i - 1 if j == -1 else j) == i - 1
                   else saved[i - 1 if j == -1 else j] for j in node.f]

        op = node.op
        if op in HEAD_OPS:
            variant = {"Detect": "detect", "IDetect": "idetect",
                       "IKeypoint": "ikeypoint"}[op]
            head = DetectionHead(spec, variant, dtype=dtype)
            raws = head.apply(_subvars(variables, f"model_{i}"), inp,
                              train=False)
            if not reshape_heads:
                return raws
            return [reshape_level(r, spec.na, spec.no) for r in raws]
        if op in M.STATELESS_OPS:
            x = M.apply_stateless_op(op, node, inp)
        elif op == "Sum":
            from face_detection_multi_scale_tpu.models import layers_extra
            mod = layers_extra.Sum(
                len(node.f),
                bool(node.args[1]) if len(node.args) > 1 else False)
            x = mod.apply(_subvars(variables, f"model_{i}"), inp)
        else:
            if node.n_resolved > 1:
                x = inp
                for j in range(node.n_resolved):
                    mod = M.build_node_block(spec, node, dtype)
                    x = mod.apply(_subvars(variables, f"model_{i}_{j}"),
                                  x, train=False)
            else:
                mod = M.build_node_block(spec, node, dtype)
                x = mod.apply(_subvars(variables, f"model_{i}"), inp,
                              train=False)
        saved.append(x if i in save else None)
        i += 1
    raise RuntimeError("spec has no detection head as its last node")
