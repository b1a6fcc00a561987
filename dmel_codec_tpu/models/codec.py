"""DMelCodec — the mel-domain neural audio codec (the reference's VQGAN core).

Capability parity with reference models/codec_lit_modules.py:27-531:
  * dMel band view: [B, T, M] mel split into G contiguous bands of M/G mels,
    encoded per-band by a shared WaveNet ("(b g) f t" view, :186-190)
  * grouped-FSQ token bottleneck (DownsampleFiniteScalarQuantize)
  * quality-conditioning scalar projected and added to the decoder condition
    (:173-174, :200-202; fixed 2.0 at decode time, :523)
  * conditioned WaveNet mel decoder driven by Gaussian noise (:205-211)
  * public token API: encode / decode / encode_unquantized /
    get_indices_from_unquantized_features / get_quantized_features_from_indices
    (:462-531) with the reference's [B, G·R, L] index layout

This module is pure model: mel extraction (dsp.LogMelSpectrogram), the GAN
losses, and the frozen vocoder live outside so the train step composes them
functionally. Layout is channels-last ([B, T, C]) throughout; the
reference's [B, C, T] appears only at converter boundaries.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dmel_codec_tpu.nn.wavenet import WaveNet
from dmel_codec_tpu.quantize.downsample_fsq import (
    DownsampleFiniteScalarQuantize,
    FSQResult,
)
from dmel_codec_tpu.utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class DMelCodecConfig:
    """Flagship numbers from config/codec/stage/pretrain.yaml + dMel_used.yaml."""

    n_mels: int = 100
    dmel_groups: int = 10
    hop_length: int = 256
    sample_rate: int = 24000

    encoder_residual_channels: int = 70  # per band
    encoder_layers: int = 20
    decoder_layers: int = 20
    dilation_cycle: int = 4

    levels: Tuple[int, ...] = (7, 5, 5)
    n_codebooks: int = 1
    downsample_factor: Tuple[int, ...] = (2, 2)
    # serving activation dtype for decode-from-indices ("bfloat16" casts the
    # upsample/decoder path; the reference's encode_dtype knob, :47-57)
    compute_dtype: Optional[str] = None

    @property
    def band_mels(self) -> int:
        return self.n_mels // self.dmel_groups

    @property
    def concat_dim(self) -> int:
        """Grouped feature dim = quality-projection width (G * encoder res)."""
        return self.dmel_groups * self.encoder_residual_channels

    @property
    def downsample_total(self) -> int:
        return math.prod(self.downsample_factor)

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop_length / self.downsample_total

    @property
    def num_codebook_rows(self) -> int:
        """Rows in the public index layout [B, G*R, L]."""
        return self.dmel_groups * self.n_codebooks

    @property
    def codebook_size(self) -> int:
        return math.prod(self.levels)


class DMelCodec(nn.Module):
    """Encoder + grouped FSQ + conditioned decoder. All arrays channels-last."""

    config: DMelCodecConfig = DMelCodecConfig()

    def setup(self):
        cfg = self.config
        self.encoder = WaveNet(
            input_channels=cfg.band_mels,
            residual_channels=cfg.encoder_residual_channels,
            residual_layers=cfg.encoder_layers,
            dilation_cycle=cfg.dilation_cycle,
            name="encoder",
        )
        self.quantizer = DownsampleFiniteScalarQuantize(
            input_dim=cfg.concat_dim,
            n_codebooks=cfg.n_codebooks,
            n_groups=cfg.dmel_groups,
            levels=cfg.levels,
            downsample_factor=cfg.downsample_factor,
            is_dmel=True,
            name="quantizer",
        )
        self.decoder = WaveNet(
            input_channels=cfg.concat_dim,
            output_channels=cfg.n_mels,
            residual_channels=cfg.concat_dim,
            residual_layers=cfg.decoder_layers,
            dilation_cycle=cfg.dilation_cycle,
            condition_channels=cfg.concat_dim,
            name="decoder",
        )
        self.quality_projection = nn.Dense(cfg.concat_dim, name="quality_projection")

    # ---- band plumbing ----------------------------------------------------
    def _to_bands(self, mels: jnp.ndarray) -> jnp.ndarray:
        """[B, T, M] -> [B*G, T, M/G], band g = contiguous mels [g*f, (g+1)*f).

        Same grouping as the reference's view(B*G, M/G, T) on [B, M, T]
        (codec_lit_modules.py:186-190).
        """
        g = self.config.dmel_groups
        b, t, m = mels.shape
        f = m // g
        return mels.reshape(b, t, g, f).transpose(0, 2, 1, 3).reshape(b * g, t, f)

    def _expand_mask(self, mask: jnp.ndarray) -> jnp.ndarray:
        """[B, T, 1] -> [B*G, T, 1] (reference expand_mask, :156-157)."""
        return jnp.repeat(mask, self.config.dmel_groups, axis=0)

    # ---- internal compute -------------------------------------------------
    def encode_features(self, mels: jnp.ndarray, mel_masks: jnp.ndarray) -> jnp.ndarray:
        """Masked per-band WaveNet encode: [B, T, M] -> [B*G, T, res]."""
        band_masks = self._expand_mask(mel_masks)
        bands = self._to_bands(mels) * band_masks
        return self.encoder(bands) * band_masks

    def decode_mel(
        self,
        condition: jnp.ndarray,
        mel_masks: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Noise-driven conditional decode: condition [B, T, concat] -> mel."""
        return (
            self.decoder(noise * mel_masks, condition=condition) * mel_masks
        )

    def project_quality(self, quality: jnp.ndarray) -> jnp.ndarray:
        """quality [B, 1] -> [B, 1, concat] broadcastable over time."""
        return self.quality_projection(quality)[:, None, :]

    # ---- training forward -------------------------------------------------
    def __call__(
        self,
        encode_mels: jnp.ndarray,
        mel_masks: jnp.ndarray,
        quality: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, FSQResult]:
        """Training-path forward (reference training_step, :181-211).

        encode_mels [B, T, M], mel_masks [B, T, 1], quality [B, 1].
        Returns (gen_mel [B, T, M], vq_result).
        """
        features = self.encode_features(encode_mels, mel_masks)
        vq_result = self.quantizer(features)
        z = vq_result.z * mel_masks + self.project_quality(quality)
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), z.shape, dtype=z.dtype
            )
        gen_mel = self.decode_mel(z * mel_masks, mel_masks, noise)
        return gen_mel, vq_result

    # ---- public token API (reference :462-531) ----------------------------
    def encode_unquantized(
        self, mels: jnp.ndarray, mel_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """mels [B, T, M] -> (features [B*G, T, res], mel_lengths)."""
        mel_masks = sequence_mask(mel_lengths, mels.shape[1])[..., None].astype(
            mels.dtype
        )
        return self.encode_features(mels, mel_masks), mel_lengths

    def get_indices_from_unquantized_features(
        self, features: jnp.ndarray, mel_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        indices = self.quantizer.encode(features)
        return indices, mel_lengths // self.config.downsample_total

    def encode(
        self, mels: jnp.ndarray, mel_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """mels [B, T, M] + lengths -> (indices [B, G*R, L], index lengths).

        The caller extracts log-mels with dsp.LogMelSpectrogram; lengths are
        frame counts (audio_lengths // hop_length in the reference, :492).
        """
        features, mel_lengths = self.encode_unquantized(mels, mel_lengths)
        return self.get_indices_from_unquantized_features(features, mel_lengths)

    def get_quantized_features_from_indices(
        self, indices: jnp.ndarray, feature_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """indices [B, G*R, L] -> (condition z [B, T, concat], mel mask [B, T, 1]).

        Quality is fixed at 2.0 (reference :523).
        """
        factor = self.config.downsample_total
        t = indices.shape[2] * factor
        mel_masks = sequence_mask(feature_lengths * factor, t)[..., None]
        dtype = (
            jnp.dtype(self.config.compute_dtype)
            if self.config.compute_dtype
            else None
        )
        z = self.quantizer.decode(indices, dtype=dtype)
        mel_masks = mel_masks.astype(z.dtype)
        z = z * mel_masks
        quality = jnp.full((z.shape[0], 1), 2.0, dtype=z.dtype)
        return z + self.project_quality(quality), mel_masks

    def decode(
        self,
        indices: jnp.ndarray,
        feature_lengths: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """indices [B, G*R, L] -> gen_mel [B, T, M] (vocoder applied outside)."""
        z, mel_masks = self.get_quantized_features_from_indices(
            indices, feature_lengths
        )
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"), z.shape, dtype=z.dtype)
        return self.decode_mel(z, mel_masks, noise)


def quality_from_gt_mels(gt_mels: jnp.ndarray) -> jnp.ndarray:
    """Mel-occupancy quality scalar (reference :173-174).

    gt_mels [B, T, M] UNMASKED log-mels -> [B, 1]:
    count of mel bins whose time-mean exceeds -8, recentred by (x-90)/10.
    """
    occupancy = (gt_mels.mean(axis=1) > -8.0).sum(axis=-1)
    return ((occupancy - 90.0) / 10.0).astype(gt_mels.dtype)[:, None]
