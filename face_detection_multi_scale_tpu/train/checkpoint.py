"""Checkpoint save/resume via orbax.

Reference parity (train.py:509-534, utils/general.py:635-648): `last`
every epoch, `best` by fitness, a strip step producing EMA-only inference
weights; resume restores optimizer/EMA/epoch. TPU-native storage is an
orbax PyTree checkpoint per tag plus a small JSON metadata sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, tag: str, state, meta: Dict[str, Any]):
    """Save a TrainState under ckpt_dir/tag (last/best) + meta json."""
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    ckptr = _ckptr()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(ckpt_dir: str, tag: str, template) -> Tuple[Any, Dict]:
    """Restore a TrainState saved by save_checkpoint; `template` is an
    abstract or concrete state with matching structure."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    ckptr = _ckptr()
    state = ckptr.restore(path, target=template)
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def peek_meta(ckpt_dir: str, tag: str) -> Dict[str, Any]:
    """Read just the metadata sidecar without restoring the state —
    used before logger construction to recover the experiment-tracker
    run id (the check_wandb_resume equivalent,
    utils/wandb_logging/wandb_utils.py:42-53, which reads `wandb_id`
    out of the torch ckpt dict)."""
    meta_path = os.path.abspath(
        os.path.join(ckpt_dir, tag)) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def strip_to_inference(state) -> Dict[str, Any]:
    """EMA-preferred inference variables (the strip_optimizer equivalent,
    utils/general.py:635-648 + attempt_load EMA preference,
    models/experimental.py:113-141)."""
    return {"params": jax.device_get(state.ema_params),
            "batch_stats": jax.device_get(state.batch_stats)}


def save_inference_weights(path: str, variables: Dict[str, Any]):
    """Flat .npz of inference variables — small, dependency-free format
    for FaceDetector loading."""
    from flax.traverse_util import flatten_dict

    flat = {}
    for col, tree in variables.items():
        for k, v in flatten_dict(tree).items():
            flat[col + "/" + "/".join(k)] = np.asarray(v)
    np.savez(path, **flat)


def load_inference_weights(path: str) -> Dict[str, Any]:
    from flax.traverse_util import unflatten_dict

    loaded = np.load(path)
    cols: Dict[str, Dict] = {}
    for key, v in loaded.items():
        col, rest = key.split("/", 1)
        cols.setdefault(col, {})[tuple(rest.split("/"))] = v
    return {col: unflatten_dict(tree) for col, tree in cols.items()}
