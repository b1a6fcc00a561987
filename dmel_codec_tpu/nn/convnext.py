"""ConvNeXt-1D block + LayerNorm, channels-last flax.

Capability parity with reference models/modules/firefly.py:306-402
(depthwise k=7 conv -> LayerNorm eps 1e-6 -> MLP x4 with exact GELU ->
layer-scale gamma -> residual). DropPath is identity for every config the
reference runs (drop_path defaults to 0) and is omitted.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_INIT = nn.initializers.truncated_normal(stddev=0.02)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis (last axis here), eps 1e-6."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + self.eps)
        return weight * x + bias


class ConvNeXtBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    kernel_size: int = 7
    dilation: int = 1
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, apply_residual: bool = True) -> jnp.ndarray:
        inputs = x
        x = nn.Conv(
            self.dim,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            feature_group_count=self.dim,
            kernel_init=_INIT,
            name="dwconv",
        )(x)
        x = ChannelLayerNorm(name="norm")(x)
        x = nn.Dense(int(self.mlp_ratio * self.dim), kernel_init=_INIT, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=_INIT, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            x = gamma * x
        if apply_residual:
            x = inputs + x
        return x
