"""Multi-host entry wiring (parallel/multihost.py, SURVEY C27 host-shard
clause): config mapping, no-op single-process path, and the end-to-end
shard math the CLIs feed from jax.process_index()/process_count()."""

from __future__ import annotations

import jax
import numpy as np

from dmel_codec_tpu.data.manifest import Cut
from dmel_codec_tpu.data.loader import DataLoader
from dmel_codec_tpu.parallel.mesh import data_mesh
from dmel_codec_tpu.parallel.multihost import (
    DistributedConfig,
    host_shard,
    initialize,
)
from dmel_codec_tpu.utils.config import dataclass_from_dict


def test_config_mapping_from_yaml_dict():
    cfg = dataclass_from_dict(
        DistributedConfig,
        {
            "enabled": True,
            "coordinator_address": "10.0.0.1:8476",
            "num_processes": 4,
            "process_id": 2,
        },
    )
    assert cfg.enabled and cfg.num_processes == 4 and cfg.process_id == 2
    # absent section -> disabled defaults (the common single-host case)
    assert not dataclass_from_dict(DistributedConfig, None).enabled


def test_initialize_noop_when_disabled():
    """Single-process runs must not attempt a rendezvous."""
    assert initialize(None) is False
    assert initialize(DistributedConfig()) is False
    # the process still reports coherent shard coordinates
    shard, n = host_shard()
    assert n == jax.process_count() == 1
    assert shard == jax.process_index() == 0


def test_host_shard_feeds_loader_disjoint_cover():
    """The (shard_index, num_shards) pair must partition the cut set the
    way the lhotse sampler's (rank, world_size) does in the reference:
    disjoint across shards, jointly covering every cut."""
    cuts = [Cut(str(i), "x", 0.0, 1.0 + (i % 5) * 0.3, 24000) for i in range(37)]
    n_shards = 4
    seen: list[str] = []
    for shard in range(n_shards):
        loader = DataLoader(
            cuts, num_shards=n_shards, shard_index=shard, shuffle=False
        )
        seen.extend(c.id for c in loader.batcher.cuts)
    assert sorted(seen) == sorted(c.id for c in cuts)  # cover, no dupes


def test_mesh_spans_global_devices():
    """data_mesh() built from jax.devices() must span the global device
    list — under multi-process JAX that list is cross-host, so this is the
    mesh the CLIs train over (8 virtual devices in this suite)."""
    mesh = data_mesh()
    assert mesh.devices.size == jax.device_count() == 8
    assert set(np.asarray(mesh.devices).ravel()) == set(jax.devices())
