from dmel_codec_tpu.lm.inputs import TokenGridBuilder, pad_grids_to_batch
from dmel_codec_tpu.lm.sampling import logits_to_probs, sample_token

__all__ = [
    "TokenGridBuilder",
    "pad_grids_to_batch",
    "sample_token",
    "logits_to_probs",
]
