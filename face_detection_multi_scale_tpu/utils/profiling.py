"""Tracing, timing, and model-introspection utilities.

Reference parity (SURVEY.md §5 tracing/profiling): `time_synchronized`
(utils/torch_utils.py:89-93) becomes fetch-synchronized timing;
thop-based per-module FLOPS (models/yolo.py:385-393,
utils/torch_utils.py:96-132 model_info) becomes XLA's compiled cost
analysis; plus a jax.profiler trace context for TensorBoard-viewable
device profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def time_synchronized(result=None) -> float:
    """Wall time after forcing completion of `result` (the CUDA-sync
    timing idiom, utils/torch_utils.py:89-93). On remote backends a
    scalar fetch is the only true synchronization."""
    if result is not None:
        leaves = jax.tree.leaves(result)
        if leaves:
            np.asarray(jax.device_get(leaves[-1]))
    return time.perf_counter()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; open the output in TensorBoard or
    Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def param_count(variables) -> int:
    params = variables.get("params", variables)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def cost_analysis(fn, *example_args) -> Dict[str, Any]:
    """Compiled FLOPs / bytes-accessed estimate from XLA (the thop
    GFLOPS equivalent)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


def model_info(model, variables, img_size: int = 640,
               verbose: bool = True) -> Dict[str, Any]:
    """Summary line like the reference model_info
    (utils/torch_utils.py:204-225): parameter count + GFLOPs at the
    given input size."""
    n_params = param_count(variables)

    def fwd(x):
        return model.apply(variables, x, train=False)

    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    try:
        ca = cost_analysis(fwd, x)
        gflops = ca.get("flops", 0.0) / 1e9
    except Exception:
        gflops = float("nan")
    info = {"name": model.spec.name, "parameters": n_params,
            "gflops": gflops, "img_size": img_size,
            "levels": model.spec.nl, "strides": list(model.spec.strides)}
    if verbose:
        print(f"{info['name']}: {n_params:,} parameters, "
              f"{gflops:.1f} GFLOPs @ {img_size}px")
    return info


class MetricsLogger:
    """Training metrics sink: always JSONL; TensorBoard events when
    TensorFlow is importable; Weights & Biases when available and enabled
    (the reference's TensorBoard + W&B stack, train.py:499-507,
    utils/wandb_logging/wandb_utils.py)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_project: str = "fdms-tpu",
                 config: Optional[Dict] = None,
                 run_id: Optional[str] = None):
        import os

        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        self.wandb = None
        self.run_id = run_id
        if use_tensorboard:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self.tb = None
        if use_wandb:
            try:
                import wandb

                # resume-by-id: a run id recovered from a checkpoint's
                # metadata reattaches to the same tracker run (the
                # check_wandb_resume path, wandb_utils.py:42-53,96-104)
                self.wandb = wandb.init(
                    project=wandb_project, config=config or {},
                    id=run_id, resume="allow" if run_id else None)
                self.run_id = getattr(self.wandb, "id", run_id)
            except Exception:
                self.wandb = None

    def log(self, step: int, metrics: Dict[str, float]):
        import json

        clean = {k: float(v) for k, v in metrics.items()
                 if isinstance(v, (int, float, np.floating, np.integer))}
        self.jsonl.write(json.dumps({"step": step, **clean}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in clean.items():
                    tf.summary.scalar(k, v, step=step)
                self.tb.flush()
        if self.wandb is not None:
            self.wandb.log(clean, step=step)

    def log_artifact(self, path, name: str, type: str = "model",
                     metadata: Optional[Dict] = None) -> bool:
        """Version a file (weights, dataset snapshot) as a tracker
        artifact (the log_model/log_dataset_artifact surface,
        utils/wandb_logging/wandb_utils.py:127-158,201-215). No-op
        without an active W&B run; returns whether it was uploaded."""
        if self.wandb is None:
            return False
        import wandb

        art = wandb.Artifact(name, type=type, metadata=metadata or {})
        art.add_file(str(path))
        self.wandb.log_artifact(art)
        return True

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
