"""Mel-spectrogram image discriminator (LSGAN critic for codec training).

Capability parity with reference models/modules/discriminator.py:6-35:
a single 2-D conv pyramid (1→64→128→256→512→1024→1 channels) over the mel
"image", weight-normalised convs, SiLU between layers, stride-2 pyramid
over the time axis only.

TPU-first layout: input mel is channels-last [B, T, M]; internally the
image is NHWC [B, M, T, 1] so the stride-2 reductions ride XLA's native
conv layout. Output logits are [B, M', T'] (matches the reference's
[B, H, W] after its channel squeeze).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dmel_codec_tpu.nn.weight_norm import WNConv

# (features, kernel (mel, time), strides (mel, time), padding (mel, time))
_SPECS = (
    (64, (3, 9), (1, 1), (1, 4)),
    (128, (3, 9), (1, 2), (1, 4)),
    (256, (3, 9), (1, 2), (1, 4)),
    (512, (3, 9), (1, 2), (1, 4)),
    (1024, (3, 3), (1, 1), (1, 1)),
    (1, (3, 3), (1, 1), (1, 1)),
)


class MelDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, M] -> logits [B, M', T']."""
        x = mel.transpose(0, 2, 1)[..., None]  # NHWC: [B, M, T, 1]
        for idx, (features, kernel, strides, padding) in enumerate(_SPECS):
            x = WNConv(
                features,
                kernel_size=kernel,
                strides=strides,
                padding=padding,
                name=f"conv_{idx}",
            )(x)
            if idx != len(_SPECS) - 1:
                x = nn.silu(x)
        return x[..., 0]  # [B, M', T']
