"""GAN + reconstruction losses for codec training.

Parity with reference models/codec_lit_modules.py:214-267: LSGAN real/fake
objectives, masked band-weighted L1 mel loss (low 0.6 / mid 0.3 / high 0.1
halved + full-band half), nearest-neighbour mask resampling onto the
discriminator's strided time axis.

Layout: mels are channels-last [B, T, M]; masks [B, T, 1]; discriminator
logits [B, M', T'] (models/discriminator.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from dmel_codec_tpu.utils.masks import avg_with_mask


def resample_mask_nearest(mel_masks: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """[B, T, 1] -> [B, 1, T'] by nearest indexing (ref F.interpolate :216-218)."""
    t = mel_masks.shape[1]
    idx = (jnp.arange(target_len) * t) // target_len
    return mel_masks[:, idx, 0][:, None, :]


def discriminator_loss(
    real_logits: jnp.ndarray, fake_logits: jnp.ndarray, d_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LSGAN critic loss (ref :220-223). Returns (total, loss_real, loss_fake)."""
    loss_real = avg_with_mask((real_logits - 1.0) ** 2, d_mask)
    loss_fake = avg_with_mask(fake_logits**2, d_mask)
    return loss_real + loss_fake, loss_real, loss_fake


def adversarial_loss(fake_logits: jnp.ndarray, d_mask: jnp.ndarray) -> jnp.ndarray:
    """LSGAN generator objective (ref :266-267)."""
    return avg_with_mask((fake_logits - 1.0) ** 2, d_mask)


def weighted_mel_loss(
    gen_mel: jnp.ndarray, gt_mel: jnp.ndarray, mel_masks: jnp.ndarray
) -> jnp.ndarray:
    """Band-weighted masked L1 (ref :246-263): bands split at mel 40 and 70."""
    dist = jnp.abs(gen_mel - gt_mel)
    low = avg_with_mask(dist[..., :40], mel_masks)
    mid = avg_with_mask(dist[..., 40:70], mel_masks)
    high = avg_with_mask(dist[..., 70:], mel_masks)
    full = avg_with_mask(dist, mel_masks)
    return (low * 0.6 + mid * 0.3 + high * 0.1) * 0.5 + full * 0.5
