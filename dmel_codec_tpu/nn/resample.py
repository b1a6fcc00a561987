"""Kaiser-windowed sinc up/down-samplers (anti-aliased activation support).

Numerical contract matches reference
bigvgan/alias_free_activation/torch/{filter.py,resample.py}:
  * 12-tap kaiser-sinc lowpass, cutoff 0.5/ratio, half-width 0.6/ratio
  * UpSample1d: replicate-pad 5, transposed conv stride 2 scaled by ratio,
    crop 15:-15  (even-kernel asymmetry preserved exactly)
  * DownSample1d: replicate-pad (5, 6), depthwise conv stride 2

These run as XLA depthwise convolutions on [B, T, C] arrays and serve as the
correctness oracle for the fused Pallas kernel in ops/anti_alias_pallas.py.
Filters are host-precomputed numpy constants (non-trainable buffers in the
reference too).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NWC", "WIO", "NWC")  # 1-D conv dimension numbers, channels-last


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Normalized lowpass FIR, shape [kernel_size] (reference filter.py:30-62)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size

    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _depthwise_kernel(filt: jnp.ndarray, channels: int, dtype=None) -> jnp.ndarray:
    # [k] -> [k, 1, C]
    filt = filt.astype(dtype) if dtype is not None else filt
    return jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, channels))


def _replicate_pad_time(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


@partial(jax.jit, static_argnames=("ratio", "kernel_size"))
def upsample1d(x: jnp.ndarray, filt: jnp.ndarray, ratio: int = 2, kernel_size: int = 12):
    """[B, T, C] -> [B, ratio*T, C] anti-aliased upsample."""
    channels = x.shape[-1]
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2

    x = _replicate_pad_time(x, pad, pad)
    # torch conv_transpose1d(filter f) == true convolution: cross-correlate
    # against the flipped kernel over the ratio-dilated input, full padding.
    kernel = _depthwise_kernel(jnp.flip(filt, 0), channels, x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=((kernel_size - 1, kernel_size - 1),),
        lhs_dilation=(ratio,),
        dimension_numbers=_DN,
        feature_group_count=channels,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = ratio * y
    return y[:, pad_left:-pad_right, :]


@partial(jax.jit, static_argnames=("ratio", "kernel_size"))
def downsample1d(x: jnp.ndarray, filt: jnp.ndarray, ratio: int = 2, kernel_size: int = 12):
    """[B, T, C] -> [B, T//ratio, C] anti-aliased downsample."""
    channels = x.shape[-1]
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = _replicate_pad_time(x, pad_left, pad_right)
    kernel = _depthwise_kernel(filt, channels, x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(ratio,),
        padding=((0, 0),),
        dimension_numbers=_DN,
        feature_group_count=channels,
        precision=jax.lax.Precision.HIGHEST,
    )


class UpSample1d:
    def __init__(self, ratio: int = 2, kernel_size: int | None = None):
        self.ratio = ratio
        self.kernel_size = (
            int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        )
        self.filter = jnp.asarray(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size)
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return upsample1d(x, self.filter, self.ratio, self.kernel_size)


class DownSample1d:
    def __init__(self, ratio: int = 2, kernel_size: int | None = None):
        self.ratio = ratio
        self.kernel_size = (
            int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        )
        self.filter = jnp.asarray(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size)
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return downsample1d(x, self.filter, self.ratio, self.kernel_size)
