"""Temporal-downsampled grouped FSQ (the dMel token bottleneck).

Capability parity with reference models/modules/dowmsample_fsq.py:19-147:
  * strided k=factor convs (+ ConvNeXt block) halve time twice (2, 2)
  * grouped residual FSQ over the regrouped [B, T/4, groups*dim] features
  * transposed convs (+ ConvNeXt) restore the time axis, pad/crop to input
  * public token layout matches the reference exactly:
      encode -> indices [B, groups*n_codebooks, L]   ("b (g r) l")
      decode(indices) -> features

Layout: all tensors channels-last. In dMel mode the conv stacks operate on
the per-band layout [B*G, T, dim/G] (the reference's "(b g) f t" view), and
the FSQ on the regrouped [B, T, dim].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dmel_codec_tpu.nn.conv import ConvTranspose1dTorch
from dmel_codec_tpu.nn.convnext import ConvNeXtBlock
from dmel_codec_tpu.quantize.fsq import GroupedResidualFSQ


@dataclass
class FSQResult:
    z: jnp.ndarray        # reconstructed features (same layout as input)
    codes: jnp.ndarray    # [G, B, L, Q] raw grouped indices
    latents: jnp.ndarray  # pre-quantization downsampled features
    loss: jnp.ndarray | float = 0.0


class DownsampleFiniteScalarQuantize(nn.Module):
    input_dim: int = 512
    n_codebooks: int = 9
    n_groups: int = 1
    levels: Tuple[int, ...] = (8, 5, 5, 5)
    downsample_factor: Tuple[int, ...] = (2, 2)
    downsample_dims: Optional[Tuple[int, ...]] = None
    is_dmel: bool = False

    def setup(self):
        downsample_dims = self.downsample_dims or tuple(
            self.input_dim for _ in self.downsample_factor
        )
        if self.is_dmel:
            all_dims = (self.input_dim // self.n_groups,) + tuple(
                d // self.n_groups for d in downsample_dims
            )
        else:
            all_dims = (self.input_dim,) + tuple(downsample_dims)
        self.all_dims = all_dims

        self.residual_fsq = GroupedResidualFSQ(
            dim=self.input_dim,
            levels=self.levels,
            num_quantizers=self.n_codebooks,
            groups=self.n_groups,
            name="residual_fsq",
        )

        down = []
        for idx, factor in enumerate(self.downsample_factor):
            down.append(
                (
                    nn.Conv(
                        all_dims[idx + 1],
                        kernel_size=(factor,),
                        strides=(factor,),
                        padding="VALID",
                        name=f"downsample_{idx}_conv",
                    ),
                    ConvNeXtBlock(dim=all_dims[idx + 1], name=f"downsample_{idx}_block"),
                )
            )
        self.down_stages = down

        up = []
        for idx, factor in reversed(list(enumerate(self.downsample_factor))):
            up.append(
                (
                    ConvTranspose1dTorch(
                        all_dims[idx],
                        kernel_size=factor,
                        stride=factor,
                        name=f"upsample_{idx}_convt",
                    ),
                    ConvNeXtBlock(dim=all_dims[idx], name=f"upsample_{idx}_block"),
                )
            )
        self.up_stages = up

    # ---- internal helpers -------------------------------------------------
    def _downsample(self, z: jnp.ndarray) -> jnp.ndarray:
        for conv, block in self.down_stages:
            z = block(conv(z))
        return z

    def _upsample(self, z: jnp.ndarray) -> jnp.ndarray:
        for convt, block in self.up_stages:
            z = block(convt(z))
        return z

    def _bands_to_grouped(self, z: jnp.ndarray, batch: int) -> jnp.ndarray:
        """[B*G, T, f] -> [B, T, G*f] (reference "(b g) f t -> b (g f) t")."""
        g = self.n_groups
        bg, t, f = z.shape
        return z.reshape(batch, g, t, f).transpose(0, 2, 1, 3).reshape(batch, t, g * f)

    def _grouped_to_bands(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B, T, G*f] -> [B*G, T, f]."""
        g = self.n_groups
        b, t, gf = z.shape
        f = gf // g
        return z.reshape(b, t, g, f).transpose(0, 2, 1, 3).reshape(b * g, t, f)

    # ---- public API -------------------------------------------------------
    def __call__(self, z: jnp.ndarray) -> FSQResult:
        """Training path. z: [B*G, T, f] if dMel else [B, T, C]."""
        original_t = z.shape[1]
        original_batch = z.shape[0] // self.n_groups if self.is_dmel else z.shape[0]

        z = self._downsample(z)
        if self.is_dmel:
            z = self._bands_to_grouped(z, original_batch)

        quantized, indices = self.residual_fsq(z)
        result = FSQResult(z=quantized, codes=indices, latents=z)

        zq = result.z
        if self.is_dmel:
            zq = self._grouped_to_bands(zq)
        zq = self._upsample(zq)
        if self.is_dmel:
            zq = self._bands_to_grouped(zq, original_batch)

        # Pad time back to the input length (reference :112-120). With
        # kernel==stride down/up stages the output is 4*floor(T/4) <= T,
        # so only the pad branch is reachable.
        diff = original_t - zq.shape[1]
        assert diff >= 0, "upsample produced more frames than the input"
        if diff > 0:
            left = diff // 2
            zq = jnp.pad(zq, ((0, 0), (left, diff - left), (0, 0)))
        result.z = zq
        return result

    def encode(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B*G, T, f] (dMel) -> indices [B, G*R, L]."""
        batch = z.shape[0] // self.n_groups if self.is_dmel else z.shape[0]
        z = self._downsample(z)
        if self.is_dmel:
            z = self._bands_to_grouped(z, batch)
        _, indices = self.residual_fsq(z)  # [G, B, L, R]
        g, b, l, r = indices.shape
        # "g b l r -> b (g r) l"
        return indices.transpose(1, 0, 3, 2).reshape(b, g * r, l)

    def decode(self, indices: jnp.ndarray, dtype=None) -> jnp.ndarray:
        """indices [B, G*R, L] -> features [B, L*prod(factors), G*f].

        dtype: activation dtype for the upsample stack (FSQ lookup itself
        stays f32-exact); pass e.g. bfloat16 for serving."""
        b, gr, l = indices.shape
        g = self.n_groups
        r = gr // g
        grouped = indices.reshape(b, g, r, l).transpose(1, 0, 3, 2)  # [G, B, L, R]
        z_q = self.residual_fsq.decode(grouped)  # [B, L, dim]
        if dtype is not None:
            z_q = z_q.astype(dtype)
        if self.is_dmel:
            z_q = self._grouped_to_bands(z_q)
        z_q = self._upsample(z_q)
        if self.is_dmel:
            z_q = self._bands_to_grouped(z_q, b)
        return z_q
