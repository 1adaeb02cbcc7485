"""Convert reference PyTorch checkpoints (state dicts) to framework
variables.

The flax submodule naming in models/layers.py and models/head.py was chosen
to mirror the torch module paths (reference models/yolo.py parse_model
assigns top-level names model.{i}), so the mapping is mechanical:

  torch "model.17.branch1.0.weight" -> ("model_17", "branch1_0", "kernel")

Rules:
  * numeric path components merge into the preceding name with "_"
  * 4D conv weights (O, I/g, kh, kw) transpose to HWIO (kh, kw, I/g, O)
  * 1D BN weight/bias -> scale/bias (params); running_mean/var ->
    mean/var (batch_stats); num_batches_tracked dropped
  * implicit knowledge params (1, C, 1, 1) -> (C,)
  * head anchor buffers (anchors / anchor_grid) dropped — anchors live in
    the ModelSpec
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _merge_numeric(parts):
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def torch_key_to_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """Split a torch state-dict key into (flax module path, leaf name)."""
    parts = key.split(".")
    leaf = parts.pop()
    return tuple(_merge_numeric(parts)), leaf


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state dict (tensors or ndarrays) -> flax variables dict
    {"params": ..., "batch_stats": ...}."""
    # first pass: find BN modules (they own running_mean)
    bn_modules = set()
    for key in state_dict:
        if key.endswith("running_mean"):
            path, _ = torch_key_to_path(key)
            bn_modules.add(path)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        path, leaf = torch_key_to_path(key)
        if leaf in ("anchors", "anchor_grid"):
            continue
        v = np.asarray(value.detach().cpu().numpy()
                       if hasattr(value, "detach") else value)
        if leaf == "weight":
            if v.ndim == 4:  # conv OIHW -> HWIO
                put(params, path, "kernel", v.transpose(2, 3, 1, 0))
            elif v.ndim == 1 and path in bn_modules:
                put(params, path, "scale", v)
            else:
                raise ValueError(f"unhandled weight shape {v.shape} at {key}")
        elif leaf == "bias":
            put(params, path, "bias", v)
        elif leaf == "running_mean":
            put(stats, path, "mean", v)
        elif leaf == "running_var":
            put(stats, path, "var", v)
        elif leaf == "implicit":
            put(params, path, "implicit", v.reshape(-1))
        else:
            raise ValueError(f"unhandled leaf {leaf!r} at {key}")
    return {"params": params, "batch_stats": stats}


def assert_tree_shapes_match(converted, initialized, prefix=""):
    """Recursively compare two variable trees, raising on any mismatch —
    catches silent name/shape divergence between converter and model."""
    ck, ik = set(converted), set(initialized)
    if ck != ik:
        raise ValueError(
            f"tree mismatch at {prefix or '/'}: only-converted="
            f"{sorted(ck - ik)} only-model={sorted(ik - ck)}")
    for k in ck:
        c, i = converted[k], initialized[k]
        if isinstance(c, dict) or isinstance(i, dict):
            assert_tree_shapes_match(c, i, f"{prefix}/{k}")
        else:
            if tuple(np.shape(c)) != tuple(np.shape(i)):
                raise ValueError(
                    f"shape mismatch at {prefix}/{k}: "
                    f"{np.shape(c)} vs {np.shape(i)}")


def load_torch_checkpoint(path: str):
    """Load a reference .pt checkpoint and return its (EMA-preferred) fused
    float state dict, mirroring attempt_load semantics
    (reference models/experimental.py:113-141) minus the BN fuse — our
    converter keeps BN separate and the model applies running stats."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and ("ema" in ckpt or "model" in ckpt):
        # training ckpt dict (train.py:517-524): EMA preferred
        model = ckpt.get("ema") or ckpt.get("model")
    else:
        model = ckpt  # bare module or raw state dict
    if hasattr(model, "float"):
        model = model.float()
        return {k: v for k, v in model.state_dict().items()}
    return {k: v.float() if v.is_floating_point() else v
            for k, v in model.items()}
