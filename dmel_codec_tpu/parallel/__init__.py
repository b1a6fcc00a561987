from dmel_codec_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    data_mesh,
    dp_tp_mesh,
    lm_param_shardings,
    replicated,
    shard_batch,
    shard_lm_params,
)
from dmel_codec_tpu.parallel.pipeline import (
    pipelined_decoder,
    split_stage_params,
    stage_mesh,
)
from dmel_codec_tpu.parallel.sequence import (
    time_sharded_decode,
    time_sharded_encode,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_mesh",
    "dp_tp_mesh",
    "batch_sharding",
    "lm_param_shardings",
    "replicated",
    "shard_batch",
    "shard_lm_params",
    "pipelined_decoder",
    "split_stage_params",
    "stage_mesh",
    "time_sharded_decode",
    "time_sharded_encode",
]
