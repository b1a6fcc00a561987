from dmel_codec_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    replicated,
    shard_batch,
)

__all__ = ["data_mesh", "batch_sharding", "replicated", "shard_batch"]
