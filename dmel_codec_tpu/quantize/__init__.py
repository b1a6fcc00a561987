from dmel_codec_tpu.quantize.fsq import FSQ, GroupedResidualFSQ, ResidualFSQ
from dmel_codec_tpu.quantize.downsample_fsq import (
    DownsampleFiniteScalarQuantize,
    FSQResult,
)

__all__ = [
    "FSQ",
    "ResidualFSQ",
    "GroupedResidualFSQ",
    "DownsampleFiniteScalarQuantize",
    "FSQResult",
]
