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
