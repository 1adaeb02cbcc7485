"""Device mesh and sharding helpers.

The reference scales with NCCL DDP + DistributedSampler + SyncBN
(reference train.py:649-658, utils/datasets.py:78, train.py:247-249).
The TPU-native equivalent here is a 1-D data mesh: parameters replicated,
batches sharded along the "data" axis, XLA inserting the gradient psum and
the cross-replica batch-norm reductions automatically under jit. Multi-host
setups call `initialize_distributed()` first (jax.distributed), after which
the same code runs over the global device set — ICI within a slice, DCN
across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init (the torch.distributed.init_process_group
    equivalent, reference train.py:652-656). No-op on a single host."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host pytree with the leading dim sharded on the data
    axis (the DistributedSampler equivalent: each device owns a slice)."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def is_main_process() -> bool:
    """Rank-0 gating (reference utils/torch_utils.py:27-36)."""
    return jax.process_index() == 0


# ---------------------------------------------------------------------------
# spatial sharding (the giant-pyramid-scale path)
# ---------------------------------------------------------------------------

SPATIAL_AXES = ("sp_h", "sp_w")


def make_spatial_mesh(devices: Optional[Sequence] = None,
                      rows: Optional[int] = None) -> Mesh:
    """2-D (sp_h, sp_w) mesh for sharding one image's HEIGHT x WIDTH
    across chips — the TPU answer to the reference pyramid's 3840x3840
    scale (multi_scale_face_detector.py:33), whose NHWC activations do
    not fit one chip's HBM at serving batch sizes. Convolutions over a
    spatially sharded input compile to per-shard convs + automatic halo
    exchanges inserted by XLA GSPMD; no manual tiling."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if rows is None:
        rows = int(np.sqrt(n))
        while n % rows:
            rows -= 1
    return Mesh(np.array(devices).reshape(rows, n // rows), SPATIAL_AXES)


def spatial_input_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch with H and W sharded over the spatial mesh axes;
    batch and channels replicated."""
    return NamedSharding(mesh, P(None, SPATIAL_AXES[0], SPATIAL_AXES[1],
                                 None))


def spatial_infer(model, variables, images_u8, mesh: Mesh,
                  postprocess=None, dtype=None):
    """Run one (small-batch, huge-resolution) forward with the image
    plane sharded across the mesh. `postprocess` maps the decoded
    (bs, N, no) predictions to the final result INSIDE the jit (so the
    gather of fully-replicated candidates happens on device); defaults
    to returning the decoded predictions.

    The network's strided convs keep the spatial partition until the
    head; the decoded candidate tensor (bs, N, no) has no spatial dims
    left, so XLA all-gathers it implicitly — exactly the communication
    pattern we want: halos during the convs, one gather at the end."""
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models.head import decode

    dtype = dtype or jnp.float32
    spec = model.spec

    @jax.jit
    def run(variables, x_u8):
        x = x_u8.astype(dtype) / 255.0
        raws = model.apply(variables, x, train=False)
        preds = decode(raws, spec)
        return postprocess(preds) if postprocess is not None else preds

    with mesh:
        sharded = jax.device_put(images_u8, spatial_input_sharding(mesh))
        rep = jax.device_put(variables, replicated(mesh))
        return run(rep, sharded)
