"""Device mesh + sharding helpers (the TPU answer to the reference's DDP).

The reference's only parallelism is data parallelism via Lightning DDP /
NCCL all-reduce (SURVEY C27: strategy ddp, sampler world_size, sync_dist).
Here that becomes single-controller JAX: a 1-D `data` mesh over ICI,
parameters replicated, batches sharded on axis 0, and gradient reduction
emerging from XLA's partitioner inside the jitted train step — no explicit
collectives needed in model code.

Multi-host: per-host data loading indexes shards by `jax.process_index()`
(data/loader.py); everything here works unchanged under multi-process JAX.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put every array leaf of `batch` with axis-0 sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
