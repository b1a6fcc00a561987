from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
from dmel_codec_tpu.models.discriminator import MelDiscriminator

__all__ = ["DMelCodec", "DMelCodecConfig", "MelDiscriminator"]
