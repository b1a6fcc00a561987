"""Length-mask helpers (reference: dmel_codec/utils/utils.py:48-67).

Masks are the XLA answer to the reference's ragged batches: all shapes are
static, validity is carried in a boolean/float mask.
Layout note: this codebase is channels-last internally, so masks for
feature maps are [B, T, 1] (the reference uses [B, 1, T]).
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """lengths [B] (or [1, B]) -> bool [B, max_length]."""
    if lengths.ndim == 2:
        lengths = lengths.reshape(-1)
    positions = jnp.arange(max_length, dtype=lengths.dtype)
    return positions[None, :] < lengths[:, None]


def avg_with_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over positions where mask==1; mask broadcasts against x.

    Matches reference avg_with_mask: sum(x * mask) / sum(mask) with the mask
    expanded to x's shape (so the denominator counts every element covered).
    """
    mask = mask.astype(x.dtype)
    bmask = jnp.broadcast_to(mask, x.shape)
    return (x * bmask).sum() / bmask.sum()
