from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
from dmel_codec_tpu.models.discriminator import MelDiscriminator
from dmel_codec_tpu.models.firefly import FireflyGAN, HiFiGANGenerator
from dmel_codec_tpu.models.lm import ChatMusicLM, SlowFastLMConfig
from dmel_codec_tpu.models.reference_encoder import ReferenceEncoder
from dmel_codec_tpu.models.transformer import Decoder, TransformerConfig

__all__ = [
    "DMelCodec",
    "DMelCodecConfig",
    "MelDiscriminator",
    "BigVGAN",
    "BigVGANConfig",
    "FireflyGAN",
    "HiFiGANGenerator",
    "ChatMusicLM",
    "SlowFastLMConfig",
    "Decoder",
    "TransformerConfig",
    "ReferenceEncoder",
]
