"""Device mesh + sharding helpers (the TPU answer to the reference's DDP).

The reference's only parallelism is data parallelism via Lightning DDP /
NCCL all-reduce (SURVEY C27: strategy ddp, sampler world_size, sync_dist).
Here that becomes single-controller JAX: a 1-D `data` mesh over ICI,
parameters replicated, batches sharded on axis 0, and gradient reduction
emerging from XLA's partitioner inside the jitted train step — no explicit
collectives needed in model code.

Beyond-parity: Megatron-style TENSOR parallelism for the LM over a 2-D
(data, model) mesh — attention heads and MLP hidden dim column-sharded,
o_proj/down_proj row-sharded, so XLA's partitioner inserts exactly one
all-reduce per attention block and one per MLP (the classic pattern).
Everything is annotation-only: `NamedSharding`s on the param tree, no
model-code changes; GQA KV heads shard while `model` divides num_kv_heads.

Also beyond-parity: FSDP (ZeRO-3) — parameters and Adam moments sharded
over the DATA axis too (each param's largest free dimension), so per-chip
state memory drops ~N×; XLA's partitioner turns the annotations into the
standard all-gather-on-use / reduce-scatter-on-grad schedule. Composes
with TP on a (data, model) mesh: the model axis takes the Megatron
dimension, the data axis takes a remaining one.

Multi-host: per-host data loading indexes shards by `jax.process_index()`
(data/loader.py); everything here works unchanged under multi-process JAX.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


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


# ---------------------------------------------------------------------------
# Tensor parallelism (LM)
# ---------------------------------------------------------------------------


def dp_tp_mesh(
    model: int,
    data: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D (data, model) mesh: `model`-way tensor parallel within
    contiguous device groups (adjacent devices share the highest-bandwidth
    ICI links), data parallel across groups."""
    devices = list(devices) if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // model
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# column-parallel: output features sharded (their consumers keep the shard
# local); row-parallel: input features sharded (contraction over the shard
# makes XLA emit the block's single all-reduce)
_TP_COL_PARENTS = (
    "q_proj",
    "k_proj",
    "v_proj",
    "gate_proj",
    "up_proj",
    "text_head",
    "audio_head",
)
_TP_ROW_PARENTS = ("o_proj", "down_proj")


def lm_param_pspec(path, leaf, model_size: int) -> P:
    """Megatron-style PartitionSpec for one LM parameter.

    Axis indices count from the RIGHT so stacked scan-layer params
    ([L, in, out]) get the same logical sharding as per-layer ones.
    Any dimension the mesh doesn't divide falls back to replication.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    parent = names[-2] if len(names) >= 2 else ""
    leaf_name = names[-1]

    def sharded(axis_from_right: int) -> P:
        axis = leaf.ndim - axis_from_right
        if leaf.shape[axis] % model_size:
            return P()
        spec = [None] * leaf.ndim
        spec[axis] = MODEL_AXIS
        return P(*spec)

    if parent in _TP_COL_PARENTS and leaf_name in ("kernel", "bias"):
        return sharded(1)
    if parent in _TP_ROW_PARENTS and leaf_name == "kernel":
        return sharded(2)
    return P()


def _with_fsdp(spec: P, leaf, data_size: int) -> P:
    """Add ZeRO-3 sharding over the data axis to an (optionally TP-)
    sharded leaf: shard the largest still-unsharded dimension that the
    data axis divides. 0/1-D leaves (norm weights, biases) stay as they
    are — they're negligible state."""
    if leaf.ndim < 2 or data_size <= 1:
        return spec
    entries = list(spec) + [None] * (leaf.ndim - len(spec))
    free = [
        i
        for i in range(leaf.ndim)
        if entries[i] is None and leaf.shape[i] % data_size == 0
    ]
    if not free:
        return spec
    axis = max(free, key=lambda i: leaf.shape[i])
    entries[axis] = DATA_AXIS
    return P(*entries)


def lm_param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """NamedSharding tree for an LM param tree.

    - mesh without a model axis, fsdp=False: replicated (plain DDP).
    - mesh with a model axis: Megatron TP specs (`lm_param_pspec`).
    - fsdp=True: additionally shard each param's largest free dimension
      over the data axis (ZeRO-3); composes with TP.
    """
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    data_size = mesh.shape.get(DATA_AXIS, 1) if fsdp else 1
    if model_size <= 1 and data_size <= 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)

    def spec_for(path, leaf):
        spec = lm_param_pspec(path, leaf, model_size) if model_size > 1 else P()
        return NamedSharding(mesh, _with_fsdp(spec, leaf, data_size))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_lm_params(params, mesh: Mesh, fsdp: bool = False):
    """Device-put LM params with tensor-parallel and/or FSDP layout."""
    return jax.device_put(params, lm_param_shardings(params, mesh, fsdp=fsdp))
