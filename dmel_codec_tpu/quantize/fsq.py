"""Finite Scalar Quantization, built from scratch for JAX.

Semantics are interchangeable with the `vector_quantize_pytorch`
GroupedResidualFSQ the reference wraps (models/modules/dowmsample_fsq.py:39-44),
re-derived from the FSQ paper construction:

  * per-dim levels L: bound z with tanh into [-(L-1)/2, (L-1)/2] (with the
    standard 1e-3 widening and half-shift for even L), round with a
    straight-through estimator, normalise to [-1, 1]
  * indices are the mixed-radix packing of the rounded code against
    basis = cumprod([1, levels[:-1]])
  * ResidualFSQ projects dim -> len(levels) in, quantizes num_quantizers
    residual rounds (round i scaled by (levels-1)^-i), projects back out.
    The residual loop starts from bound(project_in(x)) — NOT raw x — exactly
    as the library's residual_fsq.py does (`residual =
    first(self.layers).bound(x)`), so layer 0 effectively double-bounds.
    This quirk must be preserved for token interchangeability.
  * GroupedResidualFSQ splits the feature dim into independent groups
    (vmapped here — one compiled body for all groups)

The exact library semantics are locked down by a plain-numpy line-by-line
re-derivation used as the test oracle (tests/test_fsq_golden.py).

Everything is static-shaped and jit-friendly; the rounding runs on the VPU,
the projections on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-3


def _levels_np(levels: Tuple[int, ...]) -> np.ndarray:
    return np.asarray(levels, dtype=np.int32)


def _basis_np(levels: Tuple[int, ...]) -> np.ndarray:
    return np.concatenate(([1], np.cumprod(levels[:-1]))).astype(np.int32)


def round_ste(z: jnp.ndarray) -> jnp.ndarray:
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


class FSQ(nn.Module):
    """Single-codebook FSQ over the last axis (size == len(levels))."""

    levels: Tuple[int, ...]

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    def bound(self, z: jnp.ndarray) -> jnp.ndarray:
        levels = jnp.asarray(_levels_np(self.levels), jnp.float32)
        half_l = (levels - 1) * (1 + _EPS) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """z [..., d] -> normalized codes in [-1, 1] with STE."""
        quantized = round_ste(self.bound(z))
        half_width = _levels_np(self.levels) // 2
        return quantized / jnp.asarray(half_width, jnp.float32)

    def codes_to_indices(self, codes: jnp.ndarray) -> jnp.ndarray:
        half_width = jnp.asarray(_levels_np(self.levels) // 2, jnp.float32)
        zhat = codes * half_width + half_width
        basis = jnp.asarray(_basis_np(self.levels), jnp.float32)
        return (zhat * basis).sum(-1).astype(jnp.int32)

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        levels = _levels_np(self.levels)
        basis = _basis_np(self.levels)
        codes_non_centered = (indices[..., None] // basis) % levels
        half_width = jnp.asarray(levels // 2, jnp.float32)
        return (codes_non_centered.astype(jnp.float32) - half_width) / half_width

    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        codes = self.quantize(z.astype(jnp.float32))
        indices = self.codes_to_indices(jax.lax.stop_gradient(codes))
        return codes, indices


class ResidualFSQ(nn.Module):
    """dim -> len(levels) projection, residual FSQ rounds, projection back."""

    dim: int
    levels: Tuple[int, ...]
    num_quantizers: int = 1

    def setup(self):
        codebook_dim = len(self.levels)
        self.requires_projection = codebook_dim != self.dim
        if self.requires_projection:
            self.project_in = nn.Dense(codebook_dim, name="project_in")
            self.project_out = nn.Dense(self.dim, name="project_out")
        self.fsq = FSQ(levels=self.levels)
        levels_minus_1 = np.asarray(self.levels, np.float32) - 1
        self.scales = np.stack(
            [levels_minus_1 ** (-float(i)) for i in range(self.num_quantizers)]
        )  # [Q, d]

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B, T, dim] -> (quantized [B, T, dim], indices [B, T, Q])."""
        orig_dtype = x.dtype
        if self.requires_projection:
            x = self.project_in(x)
        # Library semantics (residual_fsq.py forward): the residual chain
        # starts from the FIRST layer's bound of the projected input, and the
        # whole loop runs in f32 (autocast disabled / force_quantization_f32).
        x = x.astype(jnp.float32)
        quantized_out = jnp.zeros_like(x)
        residual = self.fsq.bound(x)
        all_indices = []
        for i in range(self.num_quantizers):
            scale = jnp.asarray(self.scales[i])
            codes, indices = self.fsq(residual / scale)
            codes = codes * scale
            residual = residual - jax.lax.stop_gradient(codes)
            quantized_out = quantized_out + codes
            all_indices.append(indices)
        quantized_out = quantized_out.astype(orig_dtype)
        if self.requires_projection:
            quantized_out = self.project_out(quantized_out)
        return quantized_out, jnp.stack(all_indices, axis=-1)

    def get_output_from_indices(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices [B, T, Q] -> [B, T, dim]."""
        codes_summed = None
        for i in range(self.num_quantizers):
            codes = self.fsq.indices_to_codes(indices[..., i])
            codes = codes * jnp.asarray(self.scales[i])
            codes_summed = codes if codes_summed is None else codes_summed + codes
        if self.requires_projection:
            codes_summed = self.project_out(codes_summed)
        return codes_summed


class GroupedResidualFSQ(nn.Module):
    """Feature dim split into `groups` independent ResidualFSQs (vmapped).

    __call__: x [B, T, dim] -> (quantized [B, T, dim], indices [G, B, T, Q])
    decode:   indices [G, B, T, Q] -> [B, T, dim]
    """

    dim: int
    levels: Tuple[int, ...]
    num_quantizers: int = 1
    groups: int = 1

    def setup(self):
        assert self.dim % self.groups == 0
        vmapped = nn.vmap(
            ResidualFSQ,
            in_axes=0,
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            methods=["__call__", "get_output_from_indices"],
        )
        self.rvqs = vmapped(
            dim=self.dim_per_group,
            levels=self.levels,
            num_quantizers=self.num_quantizers,
            name="rvqs",
        )

    @property
    def dim_per_group(self) -> int:
        return self.dim // self.groups

    def _split_groups(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.groups, self.dim_per_group).transpose(2, 0, 1, 3)

    def _merge_groups(self, x: jnp.ndarray) -> jnp.ndarray:
        g, b, t, d = x.shape
        return x.transpose(1, 2, 0, 3).reshape(b, t, g * d)

    def __call__(self, x: jnp.ndarray):
        quantized, indices = self.rvqs(self._split_groups(x))
        return self._merge_groups(quantized), indices

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices [G, B, T, Q] -> [B, T, dim]."""
        return self._merge_groups(self.rvqs.get_output_from_indices(indices))
