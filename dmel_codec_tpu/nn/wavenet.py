"""WaveNet encoder/decoder stack, channels-last flax.

Capability parity with reference models/modules/wavenet.py:84-225
(ResidualBlock gated units, skip-sum / sqrt(L), optional 1x1 input /
output / condition projections, dilation cycle 2^(i % cycle)).

TPU-first notes:
  * layout is [B, T, C]; 1x1 convs are Dense layers (pure MXU matmuls)
  * dilated k=3 convs use XLA's conv_general_dilated via nn.Conv with
    SAME padding — identical arithmetic to the reference's
    padding=dilation choice for kernel 3
  * the diffusion-step pathway of the reference is unused by every
    config (SURVEY C4) and is intentionally not reproduced
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

_INIT = nn.initializers.truncated_normal(stddev=0.02)


class ResidualBlock(nn.Module):
    residual_channels: int
    dilation: int = 1
    use_condition: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None):
        c = self.residual_channels
        y = nn.Conv(
            2 * c,
            kernel_size=(3,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            kernel_init=_INIT,
            name="conv",
        )(x)
        if self.use_condition:
            assert condition is not None
            y = y + nn.Dense(2 * c, kernel_init=_INIT, name="condition_projection")(
                condition
            )
        gate, filt = jnp.split(y, 2, axis=-1)
        y = nn.sigmoid(gate) * nn.tanh(filt)
        y = nn.Dense(2 * c, kernel_init=_INIT, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class WaveNet(nn.Module):
    """[B, T, C_in] -> [B, T, C_out]."""

    input_channels: Optional[int] = None
    output_channels: Optional[int] = None
    residual_channels: int = 512
    residual_layers: int = 20
    dilation_cycle: Optional[int] = 4
    condition_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None):
        c = self.residual_channels
        if self.input_channels is not None and self.input_channels != c:
            x = nn.Dense(c, kernel_init=_INIT, name="input_projection")(x)
            x = nn.silu(x)

        skip_sum = None
        for i in range(self.residual_layers):
            dilation = 2 ** (i % self.dilation_cycle) if self.dilation_cycle else 1
            x, skip = ResidualBlock(
                residual_channels=c,
                dilation=dilation,
                use_condition=self.condition_channels is not None,
                name=f"layer_{i}",
            )(x, condition)
            skip_sum = skip if skip_sum is None else skip_sum + skip

        y = skip_sum / math.sqrt(self.residual_layers)
        y = nn.Dense(c, kernel_init=_INIT, name="skip_projection")(y)

        if self.output_channels is not None and self.output_channels != c:
            y = nn.silu(y)
            y = nn.Dense(
                self.output_channels, kernel_init=_INIT, name="output_projection"
            )(y)
        return y
