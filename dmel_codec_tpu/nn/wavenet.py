"""WaveNet encoder/decoder stack, channels-last flax.

Capability parity with reference models/modules/wavenet.py:84-225
(ResidualBlock gated units, skip-sum / sqrt(L), optional 1x1 input /
output / condition projections, dilation cycle 2^(i % cycle)).

TPU-first notes:
  * layout is [B, T, C]; 1x1 convs are Dense layers (pure MXU matmuls)
  * dilated k=3 convs use XLA's conv_general_dilated via nn.Conv with
    SAME padding — identical arithmetic to the reference's
    padding=dilation choice for kernel 3
  * the diffusion-step pathway (is_diffusion + per-block projection,
    wavenet.py:14-28,119-123) is reproduced for API completeness even
    though no reference config exercises it
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_INIT = nn.initializers.truncated_normal(stddev=0.02)


def diffusion_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal step embedding (reference DiffusionEmbedding, :14-28).
    t [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(np.log(10000.0) / (half - 1) * -jnp.arange(half))
    ang = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(nn.softplus(x))


class ResidualBlock(nn.Module):
    residual_channels: int
    dilation: int = 1
    use_condition: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
        diffusion_step: Optional[jnp.ndarray] = None,
    ):
        c = self.residual_channels
        y = x
        if diffusion_step is not None:
            step = nn.Dense(
                c, use_bias=False, kernel_init=_INIT, name="diffusion_projection"
            )(diffusion_step)
            y = y + step[:, None, :]
        y = nn.Conv(
            2 * c,
            kernel_size=(3,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            kernel_init=_INIT,
            name="conv",
        )(y)
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
    is_diffusion: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
        t: Optional[jnp.ndarray] = None,
    ):
        c = self.residual_channels
        if self.input_channels is not None and self.input_channels != c:
            x = nn.Dense(c, kernel_init=_INIT, name="input_projection")(x)
            x = nn.silu(x)

        step = None
        if t is not None:
            assert self.is_diffusion, "pass is_diffusion=True to use t"
            step = diffusion_embedding(t, c)
            step = nn.Dense(4 * c, use_bias=False, kernel_init=_INIT, name="mlp_0")(step)
            step = _mish(step)
            step = nn.Dense(c, use_bias=False, kernel_init=_INIT, name="mlp_1")(step)

        skip_sum = None
        for i in range(self.residual_layers):
            dilation = 2 ** (i % self.dilation_cycle) if self.dilation_cycle else 1
            x, skip = ResidualBlock(
                residual_channels=c,
                dilation=dilation,
                use_condition=self.condition_channels is not None,
                name=f"layer_{i}",
            )(x, condition, step)
            skip_sum = skip if skip_sum is None else skip_sum + skip

        y = skip_sum / math.sqrt(self.residual_layers)
        y = nn.Dense(c, kernel_init=_INIT, name="skip_projection")(y)

        if self.output_channels is not None and self.output_channels != c:
            y = nn.silu(y)
            y = nn.Dense(
                self.output_channels, kernel_init=_INIT, name="output_projection"
            )(y)
        return y
