"""1-D transposed convolution with torch ConvTranspose1d semantics.

Needed for the quantizer's upsample stack (kernel == stride) and BigVGAN's
upsamplers (kernel == 2*stride, padding (k-u)//2). flax's ConvTranspose has
different padding conventions, so this implements the torch contract
explicitly: out_len = (T-1)*stride - 2*padding + kernel.

Kernel parameter layout is [k, in, out] (torch's [in, out, k] transposed at
load time, see utils/torch_compat.conv_transpose1d_kernel — without flip;
the time flip happens here).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def conv_transpose1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    padding: int = 0,
    precision=None,
    feature_group_count: int = 1,
) -> jnp.ndarray:
    """x [B, T, I], kernel [k, I/G, O] -> [B, (T-1)*stride - 2*padding + k, O].

    With feature_group_count=G the input channels split into G independent
    groups (grouped transposed conv, used by the merged-batch vocoder
    layout where G = batch)."""
    dtype = jnp.result_type(x.dtype, kernel.dtype)
    x, kernel = x.astype(dtype), kernel.astype(dtype)
    k = kernel.shape[0]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, 0),
        window_strides=(1,),
        padding=((pad, pad),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
        feature_group_count=feature_group_count,
    )


class ConvTranspose1dTorch(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, x.shape[-1], self.features),
        )
        y = conv_transpose1d(x, kernel, self.stride, self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y
