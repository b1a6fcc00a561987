from dmel_codec_tpu.ops.anti_alias import (
    anti_alias_activation_reference,
    fused_anti_alias_activation,
)

__all__ = ["fused_anti_alias_activation", "anti_alias_activation_reference"]
