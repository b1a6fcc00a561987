"""Weight-normalised convolutions (explicit g·v/||v|| at every call).

The reference trains its discriminator / BigVGAN / HiFiGAN convs under
torch's weight_norm parametrization (discriminator.py:23-27, bigvgan.py:292,
firefly.py:32). Training parity needs the same reparameterization, so these
modules keep (v, g) as the trainable params and materialise the weight on
the fly — XLA folds the normalisation into the conv epilogue.

torch's weight_norm uses dim=0 of the torch layout:
  * Conv / Linear   [out, in, k...]      -> one g per OUTPUT channel
  * ConvTranspose1d [in, out, k]         -> one g per INPUT channel
which in our channels-last kernels ([k..., in, out] / [k, in, out]) means
normalising over all axes except the last (conv) or except axis 1
(transposed conv).
"""

from __future__ import annotations

import os
from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp  # noqa: F401

from dmel_codec_tpu.nn.conv import conv_transpose1d

# merged-batch conv implementation: "blockdiag" (dense kron(I_G, w) kernel,
# default — MXU-efficient) or "grouped" (feature_group_count=G, kept for
# A/B runs; measured 5-8x slower on TPU at vocoder tail shapes).
_MERGED_IMPL = os.environ.get("DMEL_MERGED_CONV", "blockdiag")


def _blockdiag(kernel: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[k..., I, O] -> [k..., G*I, G*O] with the same weights on each
    diagonal block (group g's input lanes map only to group g's outputs)."""
    eye = jnp.eye(groups, dtype=kernel.dtype)
    # kron over the trailing two axes, batched over the spatial ones
    k_shape = kernel.shape[:-2]
    i, o = kernel.shape[-2:]
    out = jnp.einsum("gh,...io->...giho", eye, kernel)
    return out.reshape(*k_shape, groups * i, groups * o)


def weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray, axis: int) -> jnp.ndarray:
    """w = g * v / ||v||, norm taken over all axes except `axis`."""
    reduce_axes = tuple(i for i in range(v.ndim) if i != axis)
    norm = jnp.sqrt(jnp.sum(v * v, axis=reduce_axes, keepdims=True))
    g_shape = [1] * v.ndim
    g_shape[axis] = v.shape[axis]
    return g.reshape(g_shape) * v / norm


def _pair(x) -> tuple:
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class WNConv(nn.Module):
    """N-D weight-normalised conv, channels-last, explicit symmetric padding.

    `padding` is in torch units: int or per-spatial-dim ints, applied on both
    sides. Initialised so that g = ||v|| (weight_norm identity at init).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    # merged-batch execution: the input carries `merged_groups` independent
    # copies of the logical channel axis ([1, T, G*C] with lanes (g, c),
    # g-major) and the SAME weights apply to every group. Params keep their
    # logical shapes — checkpoints interchange with merged_groups=1 — and
    # the normalised kernel is tiled G x along the output axis at call time
    # (a grouped conv). Used by the small-channel vocoder stages, where a
    # [B, T, C<128] tensor is physically lane-padded to 128 in HBM and the
    # merged layout is the only compact one (models/bigvgan.py).
    merged_groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = len(self.kernel_size)
        strides = (
            (self.strides,) * ndim if isinstance(self.strides, int) else tuple(self.strides)
        )
        dilation = (
            (self.dilation,) * ndim
            if isinstance(self.dilation, int)
            else tuple(self.dilation)
        )
        padding = (
            ((self.padding, self.padding),) * ndim
            if isinstance(self.padding, int)
            else tuple((p, p) for p in self.padding)
        )
        assert self.merged_groups == 1 or self.feature_group_count == 1
        in_ch = x.shape[-1] // (self.feature_group_count * self.merged_groups)
        v = self.param(
            "v", self.kernel_init, (*self.kernel_size, in_ch, self.features)
        )
        # g = ||v|| at init (torch weight_norm identity) — closes over the
        # ACTUAL v, not an independent kernel_init draw
        g = self.param(
            "g",
            lambda rng, shape: jnp.sqrt(
                jnp.sum(v**2, axis=tuple(range(ndim + 1)))
            ),
            (self.features,),
        )
        kernel = weight_norm_kernel(v, g, axis=v.ndim - 1)
        groups = self.feature_group_count
        if self.merged_groups > 1:
            if _MERGED_IMPL == "grouped":
                kernel = jnp.tile(
                    kernel, (1,) * (v.ndim - 1) + (self.merged_groups,)
                )
                groups = self.merged_groups
            else:
                # dense block-diagonal expansion: XLA's grouped conv is
                # 5-8x slower than dense at vocoder tail shapes (measured,
                # scripts/exp_merged_stage.py), so the grouped conv runs as
                # a DENSE conv with kernel kron(I_G, w) — G x the logical
                # FLOPs on the MXU, but every HBM byte moved is real.
                kernel = _blockdiag(kernel, self.merged_groups)
        dtype = jnp.result_type(x.dtype, kernel.dtype)
        x, kernel = x.astype(dtype), kernel.astype(dtype)

        spatial = "".join("DHW"[3 - ndim + i] for i in range(ndim)) if ndim <= 3 else None
        assert spatial is not None, "WNConv supports 1-3 spatial dims"
        dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=strides,
            padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=dn,
            feature_group_count=groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (jnp.tile(bias, self.merged_groups) if self.merged_groups > 1 else bias)
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalised torch-semantics 1-D transposed conv.

    Kernel layout [k, in, out]; g has one entry per INPUT channel (torch
    weight_norm dim=0 on the [in, out, k] transposed-conv weight).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    merged_groups: int = 1  # see WNConv.merged_groups

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1] // self.merged_groups
        shape = (self.kernel_size, in_ch, self.features)
        v = self.param("v", self.kernel_init, shape)
        g = self.param(
            "g",
            lambda rng, s: jnp.sqrt(jnp.sum(v**2, axis=(0, 2))),
            (in_ch,),
        )
        kernel = weight_norm_kernel(v, g, axis=1)
        fgc = 1
        if self.merged_groups > 1:
            if _MERGED_IMPL == "grouped":
                kernel = jnp.tile(kernel, (1, 1, self.merged_groups))
                fgc = self.merged_groups
            else:
                kernel = _blockdiag(kernel, self.merged_groups)
        y = conv_transpose1d(
            x, kernel, self.stride, self.padding, feature_group_count=fgc,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (jnp.tile(bias, self.merged_groups) if self.merged_groups > 1 else bias)
        return y
