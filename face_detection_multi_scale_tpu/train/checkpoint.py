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
    """Save a TrainState under ckpt_dir/tag (last/best) + meta json.

    Crash-safe: the state is written to `<tag>.tmp` first and swapped in
    with directory renames, so a crash at ANY point leaves a restorable
    checkpoint — either the old one (still at `<tag>` or parked at
    `<tag>.old`, which load_checkpoint falls back to) or the complete
    new one. The reference's torch.save(last.pt) at worst truncates the
    file being written, never the previous epoch's (train.py:517-534);
    the old rmtree-then-save here was strictly worse.

    Multi-host-safe: only process 0 writes (the state has already been
    device_get to host numpy, so a single writer is complete); callers
    no longer need to gate — the reference gates the same way on rank
    (train.py:509 `if rank in [-1, 0]`).
    """
    if jax.process_index() != 0:
        return
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    _pre_save(path)
    ckptr = _ckptr()
    ckptr.save(path + ".tmp", jax.device_get(state))
    ckptr.wait_until_finished()
    _finalize_swap(path, meta)


def _pre_save(path: str):
    """Clear a stale .tmp and resolve a parked .old BEFORE a new write:
    if a previous save crashed mid-swap, <tag>.old holds the only
    restorable state — ADOPT it back to <tag> instead of deleting it,
    otherwise a crash during the (multi-second) orbax save would leave
    NOTHING restorable."""
    import shutil

    tmp, old = path + ".tmp", path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)


def _finalize_swap(path: str, meta: Dict[str, Any]):
    """Swap a COMPLETE <tag>.tmp in: write the meta sidecar, park the
    live ckpt at .old, move the new one in, drop .old. Each step is a
    rename (atomic) or a delete of a spare copy."""
    import shutil

    old = path + ".old"
    meta_tmp = path + ".meta.json.tmp"
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(path + ".tmp", path)
    os.replace(meta_tmp, path + ".meta.json")
    if os.path.exists(old):
        shutil.rmtree(old)


class AsyncCheckpointWriter:
    """Non-blocking checkpoint saves: the orbax write of epoch N runs
    while epoch N+1 trains (the reference's torch.save blocks the loop,
    train.py:517-534; on TPU the state is already host-fetched numpy,
    so the disk write needn't stall the step stream).

    At most one save is in flight; a new save() waits for the previous.
    The crash contract matches save_checkpoint exactly — the tmp/old
    swap runs only at completion (inside wait()/the next save()/
    close()), so a crash at ANY point leaves a restorable <tag> or
    <tag>.old, and a completed-but-unswapped .tmp counts as never
    saved (the next save's _pre_save discards it)."""

    def __init__(self):
        self._ckptr = None
        self._pending = None  # (path, meta) awaiting swap

    def _get(self):
        if self._ckptr is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        return self._ckptr

    def save(self, ckpt_dir: str, tag: str, state,
             meta: Dict[str, Any]):
        if jax.process_index() != 0:
            return
        self.wait()
        path = os.path.abspath(os.path.join(ckpt_dir, tag))
        _pre_save(path)
        # device_get NOW: the async write must capture this step's
        # values, and the background thread must not fetch through the
        # device runtime mid-training
        self._get().save(path + ".tmp", jax.device_get(state))
        self._pending = (path, dict(meta))

    def wait(self):
        """Block until the in-flight save (if any) is durable: orbax
        finished writing .tmp AND the atomic swap ran."""
        if self._pending is None:
            return
        self._get().wait_until_finished()
        path, meta = self._pending
        self._pending = None
        _finalize_swap(path, meta)

    def close(self):
        self.wait()
        if self._ckptr is not None:
            self._ckptr.close()
            self._ckptr = None


def load_checkpoint(ckpt_dir: str, tag: str, template) -> Tuple[Any, Dict]:
    """Restore a TrainState saved by save_checkpoint; `template` is an
    abstract or concrete state with matching structure."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    meta_path = path + ".meta.json"  # sidecar keeps the original name
    if not os.path.exists(path) and os.path.exists(path + ".old"):
        # a crash mid-swap in save_checkpoint can leave the previous
        # checkpoint parked at <tag>.old with nothing at <tag> yet
        path = path + ".old"
    ckptr = _ckptr()
    state = ckptr.restore(path, target=template)
    meta = {}
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
