from dmel_codec_tpu.nn.convnext import ChannelLayerNorm, ConvNeXtBlock
from dmel_codec_tpu.nn.resample import (
    DownSample1d,
    UpSample1d,
    kaiser_sinc_filter1d,
)
from dmel_codec_tpu.nn.snake import Snake, SnakeBeta, snake, snake_beta
from dmel_codec_tpu.nn.wavenet import ResidualBlock, WaveNet

__all__ = [
    "WaveNet",
    "ResidualBlock",
    "ConvNeXtBlock",
    "ChannelLayerNorm",
    "Snake",
    "SnakeBeta",
    "snake",
    "snake_beta",
    "kaiser_sinc_filter1d",
    "UpSample1d",
    "DownSample1d",
]
