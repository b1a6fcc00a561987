"""Multi-host (multi-process) JAX initialization for the CLI entry points.

The reference's multi-node story is Lightning DDP spawning one process per
GPU with NCCL rendezvous (SURVEY C27, config strategy `ddp`). The JAX
equivalent is one process per HOST: `jax.distributed.initialize` performs
the rendezvous, after which `jax.devices()` is the GLOBAL device list,
`jax.process_index()/process_count()` replace the sampler's
rank/world_size (data/loader.py shards cuts per host with exactly that
pair), and the existing mesh builders (parallel/mesh.py) span hosts
unchanged — ICI inside a slice, DCN across slices, with XLA routing the
collectives.

Enable with `--distributed` on the train CLIs or a `distributed:` YAML
section:

    distributed:
      enabled: true
      # all three optional — auto-detected on TPU pods (GCE metadata);
      # required for manual/CPU rendezvous:
      coordinator_address: "10.0.0.1:8476"
      num_processes: 4
      process_id: 0

Call `initialize()` BEFORE any other JAX API touches the backend (device
enumeration pins the topology).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from dmel_codec_tpu.utils.logging import RankedLogger

log = RankedLogger(__name__)


@dataclasses.dataclass
class DistributedConfig:
    """YAML-mappable multi-process settings (`distributed:` section)."""

    enabled: bool = False
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # restrict this process to a subset of local devices (rarely needed)
    local_device_ids: Optional[Tuple[int, ...]] = None


def initialize(cfg: Optional[DistributedConfig]) -> bool:
    """Rendezvous with the other hosts if enabled. Returns True if
    multi-process mode is active after the call.

    No-op when cfg is None or cfg.enabled is False (single-process runs,
    tests, and the common one-host case stay exactly as before). On TPU
    pods every argument is optional — the backend discovers coordinator,
    process count, and process id from the pod metadata.
    """
    if cfg is None or not cfg.enabled:
        return False
    kwargs = {}
    if cfg.coordinator_address is not None:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes is not None:
        kwargs["num_processes"] = cfg.num_processes
    if cfg.process_id is not None:
        kwargs["process_id"] = cfg.process_id
    if cfg.local_device_ids is not None:
        kwargs["local_device_ids"] = list(cfg.local_device_ids)
    jax.distributed.initialize(**kwargs)
    log.info(
        "multi-host JAX up: process %d/%d, %d local of %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def host_shard() -> Tuple[int, int]:
    """(shard_index, num_shards) for per-host data loading — the JAX
    replacement for the lhotse sampler's (rank, world_size)."""
    return jax.process_index(), jax.process_count()
