from dmel_codec_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    dp_tp_mesh,
    lm_param_shardings,
    replicated,
    shard_batch,
    shard_lm_params,
)

__all__ = [
    "data_mesh",
    "dp_tp_mesh",
    "batch_sharding",
    "lm_param_shardings",
    "replicated",
    "shard_batch",
    "shard_lm_params",
]
