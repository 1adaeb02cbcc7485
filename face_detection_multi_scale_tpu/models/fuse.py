"""Conv+BN weight folding for serving.

Reference parity: every reference deployment path loads weights through
`attempt_load` -> `.fuse()` (models/experimental.py:126), which folds each
`Conv`/`DWConv` module's BatchNorm into the conv weights
(models/yolo.py:441-449: w' = w * gamma/sqrt(var+eps),
b' = beta - mu * gamma/sqrt(var+eps)) so serving runs conv+bias only.

TPU-native design: instead of changing the module graph (flax modules are
static), `fold_bn` rewrites the VARIABLES pytree in place-structure:

  * for a BN fed directly by a conv (the `Conv` pattern and friends), the
    per-channel scale gamma/sqrt(var+eps) is folded into the conv kernel's
    output channels, and the BN params are rewritten to (scale=1, mean=0,
    var=1-eps, bias=beta-mu*g) — algebraically the BN collapses to a pure
    bias add, which XLA fuses into the conv epilogue. The multiply is gone
    from the serving graph at the WEIGHT level (important for bf16: the
    scale is applied once in f32 to the kernel, not per-activation in
    bf16).
  * for a BN fed by a concat (the standalone nn.BatchNorm2d in the CSP
    blocks, which the reference fuse() does NOT touch), the affine is
    precomputed: scale'=g, bias'=beta-mu*g, mean=0, var=1-eps. Exact same
    outputs, no rsqrt/normalize at runtime.

The pytree STRUCTURE is unchanged, so folded variables remain valid for
the same model.apply, checkpoints round-trip, and jit caches stay warm.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

# BN epsilon used by every BatchNorm in models/layers*.py (torch YOLO
# convention: eps=1e-3, momentum 0.03)
BN_EPS = 1e-3

# bn-name -> conv-name pairing rules for BNs fed DIRECTLY by one conv
# (no activation in between). Derived from models/layers.py /
# layers_extra.py module definitions:
#   conv/bn          ConvBN (reference Conv/DWConv), FReLU
#   conv1/bn1 ...    DWConvblock
#   cv2_conv/cv2_bn  CrossConv
#   conv_0/conv_1    ConvBnReluMaxpool (torch Sequential indices)
#   branchK_{N-1}/branchK_N  ShuffleBlock branches
_PAIR_RULES = (
    (re.compile(r"^bn$"), lambda m: "conv"),
    (re.compile(r"^bn(\d+)$"), lambda m: f"conv{m.group(1)}"),
    (re.compile(r"^cv2_bn$"), lambda m: "cv2_conv"),
    (re.compile(r"^conv_1$"), lambda m: "conv_0"),
    (re.compile(r"^(branch\d+)_(\d+)$"),
     lambda m: f"{m.group(1)}_{int(m.group(2)) - 1}"),
)


def _is_mapping(x) -> bool:
    return hasattr(x, "keys") and hasattr(x, "__getitem__")


def _conv_partner(bn_name: str, scope: Dict[str, Any]) -> Optional[str]:
    for pat, conv_of in _PAIR_RULES:
        m = pat.match(bn_name)
        if not m:
            continue
        cand = conv_of(m)
        node = scope.get(cand)
        if (_is_mapping(node) and "kernel" in node
                and "bias" not in node):
            return cand
    return None


def fold_bn(variables, eps: float = BN_EPS):
    """Fold BatchNorm statistics into the weights for inference.

    Input/output: a `{"params": ..., "batch_stats": ...}` variables dict
    (plain nested dicts out). Outputs of `model.apply(folded, x,
    train=False)` are algebraically identical to the unfolded variables
    (float error ~1e-6). Do NOT train on folded variables — the running
    statistics are destroyed by design, exactly like the reference's
    fused serving checkpoints (utils/general.py:635-648 strip_optimizer).
    """

    def to_dict(tree):
        if _is_mapping(tree):
            return {k: to_dict(tree[k]) for k in tree.keys()}
        return tree

    params = to_dict(variables["params"])
    stats = to_dict(variables.get("batch_stats", {}))

    def walk(pscope: Dict[str, Any], sscope: Dict[str, Any]):
        for name in list(pscope.keys()):
            pnode = pscope[name]
            if not _is_mapping(pnode):
                continue
            snode = sscope.get(name) if _is_mapping(sscope) else None
            is_bn = (
                "scale" in pnode and "bias" in pnode
                and _is_mapping(snode)
                and "mean" in snode and "var" in snode)
            if not is_bn:
                walk(pnode, snode if _is_mapping(snode) else {})
                continue

            scale = np.asarray(pnode["scale"], np.float64)
            bias = np.asarray(pnode["bias"], np.float64)
            mean = np.asarray(snode["mean"], np.float64)
            var = np.asarray(snode["var"], np.float64)
            g = scale / np.sqrt(var + eps)
            new_bias = bias - mean * g
            dt = jnp.asarray(pnode["bias"]).dtype

            conv_name = _conv_partner(name, pscope)
            if conv_name is not None:
                kern = pscope[conv_name]["kernel"]
                kdt = jnp.asarray(kern).dtype
                folded = (np.asarray(kern, np.float64)
                          * g.reshape((1,) * (np.ndim(kern) - 1) + (-1,)))
                pscope[conv_name]["kernel"] = jnp.asarray(folded, kdt)
                pnode["scale"] = jnp.ones_like(jnp.asarray(pnode["scale"]))
            else:
                # concat-fed BN (CSP blocks / MixConv): precompute the
                # affine; keeps exactness without tracing the concat
                pnode["scale"] = jnp.asarray(g, dt)
            pnode["bias"] = jnp.asarray(new_bias, dt)
            # with mean=0 and var=1-eps the BN normalization is the
            # identity: (x - 0) / sqrt((1-eps) + eps) == x
            snode["mean"] = jnp.zeros_like(jnp.asarray(snode["mean"]))
            snode["var"] = jnp.full_like(jnp.asarray(snode["var"]),
                                         1.0 - eps)

    walk(params, stats)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out
