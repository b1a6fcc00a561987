"""Firefly (fish-speech) vocoder family — ConvNeXt encoder + HiFiGAN head.

Capability parity with reference models/modules/firefly.py:26-528:
  * ResBlock1 (:26-115): SiLU -> dilated WN conv -> SiLU -> WN conv, x3
  * ParralelBlock (:118-138): mean over kernel-size-parallel ResBlock1s
  * HiFiGANGenerator (:141-262): WN conv_pre -> N x [SiLU -> WN transposed
    conv (+ optional template noise conv) -> ParallelBlock] -> SiLU ->
    WN conv_post -> tanh
  * ConvNeXtEncoder (:404-474): stem conv + LN, LN + 1x1 mid layers,
    ConvNeXt stages, final LN
  * FireflyGAN (:476-528): encoder backbone + generator head with the
    fish-speech checkpoint layout ("generator."-prefixed keys)
  * FireflyArchitecture: the full fish-speech CODEC (spec transform ->
    ConvNeXt backbone -> downsample-FSQ -> HiFiGAN head) with the
    encode/decode surface the reference's evaluation drives
    (evaluation/initial_codec.py:107-110, :174-186, :213-215, :241-246)

This is the inference-only alternative codec path the reference keeps
for its fish-speech evaluation; channels-last flax like the rest of the
package.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.nn.convnext import ChannelLayerNorm, ConvNeXtBlock
from dmel_codec_tpu.nn.weight_norm import WNConv, WNConvTranspose1d
from dmel_codec_tpu.utils import torch_compat as tc


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j, d in enumerate(self.dilation):
            xt = nn.silu(x)
            xt = WNConv(
                self.channels,
                kernel_size=(self.kernel_size,),
                dilation=d,
                padding=_get_padding(self.kernel_size, d),
                name=f"conv1_{j}",
            )(xt)
            xt = nn.silu(xt)
            xt = WNConv(
                self.channels,
                kernel_size=(self.kernel_size,),
                padding=_get_padding(self.kernel_size, 1),
                name=f"conv2_{j}",
            )(xt)
            x = x + xt
        return x


class ParallelBlock(nn.Module):
    channels: int
    kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = [
            ResBlock1(self.channels, k, tuple(d), name=f"block_{i}")(x)
            for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilation_sizes))
        ]
        return sum(outs) / len(outs)


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    hop_length: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8, 2, 2)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    num_mels: int = 128
    upsample_initial_channel: int = 512
    use_template: bool = True
    pre_conv_kernel_size: int = 7
    post_conv_kernel_size: int = 7


class HiFiGANGenerator(nn.Module):
    config: HiFiGANConfig = HiFiGANConfig()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, template: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """x [B, T, num_mels] (+ template [B, T*hop, 1]) -> [B, T*hop]."""
        cfg = self.config
        assert math.prod(cfg.upsample_rates) == cfg.hop_length
        x = WNConv(
            cfg.upsample_initial_channel,
            kernel_size=(cfg.pre_conv_kernel_size,),
            padding=_get_padding(cfg.pre_conv_kernel_size),
            name="conv_pre",
        )(x)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = nn.silu(x)
            x = WNConvTranspose1d(
                ch, kernel_size=k, stride=u, padding=(k - u) // 2, name=f"up_{i}"
            )(x)
            if cfg.use_template:
                assert template is not None, "use_template needs a template signal"
                if i + 1 < len(cfg.upsample_rates):
                    stride_f0 = int(np.prod(cfg.upsample_rates[i + 1 :]))
                    noise = nn.Conv(
                        ch,
                        kernel_size=(stride_f0 * 2,),
                        strides=(stride_f0,),
                        padding=[(stride_f0 // 2, stride_f0 // 2)],
                        name=f"noise_conv_{i}",
                    )(template)
                else:
                    noise = nn.Conv(ch, kernel_size=(1,), name=f"noise_conv_{i}")(
                        template
                    )
                x = x + noise[:, : x.shape[1], :]
            x = ParallelBlock(
                ch,
                cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes,
                name=f"resblock_{i}",
            )(x)
        x = nn.silu(x)
        x = WNConv(
            1,
            kernel_size=(cfg.post_conv_kernel_size,),
            padding=_get_padding(cfg.post_conv_kernel_size),
            name="conv_post",
        )(x)
        return jnp.tanh(x[..., 0])


@dataclasses.dataclass(frozen=True)
class ConvNeXtEncoderConfig:
    input_channels: int = 3
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    kernel_size: int = 7


class ConvNeXtEncoder(nn.Module):
    config: ConvNeXtEncoderConfig = ConvNeXtEncoderConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, C_in] -> [B, T, dims[-1]]."""
        cfg = self.config
        for i in range(len(cfg.depths)):
            if i == 0:
                x = nn.Conv(
                    cfg.dims[0],
                    kernel_size=(cfg.kernel_size,),
                    padding=[(cfg.kernel_size // 2,) * 2],
                    name="stem_conv",
                )(x)
                x = ChannelLayerNorm(name="stem_norm")(x)
            else:
                x = ChannelLayerNorm(name=f"mid_norm_{i}")(x)
                x = nn.Dense(cfg.dims[i], name=f"mid_proj_{i}")(x)
            for j in range(cfg.depths[i]):
                x = ConvNeXtBlock(
                    dim=cfg.dims[i],
                    kernel_size=cfg.kernel_size,
                    name=f"stage_{i}_block_{j}",
                )(x)
        return ChannelLayerNorm(name="norm")(x)


class FireflyGAN(nn.Module):
    """fish-speech firefly-gan-base: ConvNeXt backbone + HiFiGAN head
    (reference FireflyBase sizes, firefly.py:476-499)."""

    encoder: ConvNeXtEncoderConfig = ConvNeXtEncoderConfig(
        input_channels=128, depths=(3, 3, 9, 3), dims=(128, 256, 384, 512)
    )
    head: HiFiGANConfig = HiFiGANConfig(
        hop_length=512,
        upsample_rates=(8, 8, 2, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4, 4),
        num_mels=512,
        upsample_initial_channel=512,
        use_template=False,
        pre_conv_kernel_size=13,
        post_conv_kernel_size=13,
    )

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, 128] -> waveform [B, T*512]."""
        x = ConvNeXtEncoder(self.encoder, name="backbone")(mel)
        return HiFiGANGenerator(self.head, name="head")(x)


@dataclasses.dataclass(frozen=True)
class FireflyArchitectureConfig:
    """fish-speech firefly-gan-vq codec sizes (8 groups x ~1k codes, ~21.5 Hz)."""

    sample_rate: int = 44100
    n_fft: int = 2048
    hop_length: int = 512
    n_mels: int = 160
    backbone: ConvNeXtEncoderConfig = ConvNeXtEncoderConfig(
        input_channels=160, depths=(3, 3, 9, 3), dims=(128, 256, 384, 512)
    )
    head: HiFiGANConfig = HiFiGANConfig(
        hop_length=512,
        upsample_rates=(8, 8, 2, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4, 4),
        num_mels=512,
        upsample_initial_channel=512,
        use_template=False,
        pre_conv_kernel_size=13,
        post_conv_kernel_size=13,
    )
    fsq_input_dim: int = 512
    fsq_groups: int = 8
    fsq_codebooks: int = 1
    fsq_levels: Tuple[int, ...] = (8, 5, 5, 5)
    fsq_downsample: Tuple[int, ...] = (2, 2)

    @property
    def downsample_total(self) -> int:
        return int(np.prod(self.fsq_downsample))


class FireflyArchitecture(nn.Module):
    """The full fish-speech codec: log-mel -> ConvNeXt backbone ->
    downsample-FSQ tokens -> HiFiGAN waveform head.

    Mask semantics mirror fish-speech's FireflyArchitecture exactly as the
    reference's evaluation exercises them (initial_codec.py:137-146 encode,
    :174-186 quantized-latent, :213-215 decode): mels and backbone features
    are zeroed past mel_lengths, decoded features past feature_lengths*factor,
    audio past feature_lengths*factor*hop.
    """

    config: FireflyArchitectureConfig = FireflyArchitectureConfig()

    def setup(self):
        from dmel_codec_tpu.quantize.downsample_fsq import (
            DownsampleFiniteScalarQuantize,
        )

        cfg = self.config
        self.backbone = ConvNeXtEncoder(cfg.backbone, name="backbone")
        self.head = HiFiGANGenerator(cfg.head, name="head")
        self.quantizer = DownsampleFiniteScalarQuantize(
            input_dim=cfg.fsq_input_dim,
            n_codebooks=cfg.fsq_codebooks,
            n_groups=cfg.fsq_groups,
            levels=cfg.fsq_levels,
            downsample_factor=cfg.fsq_downsample,
            is_dmel=False,
            name="quantizer",
        )

    def _mel_transform(self):
        from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram

        cfg = self.config
        return LogMelSpectrogram(
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            win_length=cfg.n_fft,
            hop_length=cfg.hop_length,
            n_mels=cfg.n_mels,
            f_max=None,
        )

    def _masked_features(
        self, audios: jnp.ndarray, audio_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        from dmel_codec_tpu.utils.masks import sequence_mask

        mels = self._mel_transform()(audios)  # [B, F, M]
        mel_lengths = audio_lengths // self.config.hop_length
        mel_masks = sequence_mask(mel_lengths, mels.shape[1])[..., None].astype(
            mels.dtype
        )
        feats = self.backbone(mels * mel_masks) * mel_masks
        return feats, mel_lengths, mel_masks

    def encode_unquantized(
        self, audios: jnp.ndarray, audio_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audios [B, T] -> (backbone features [B, F, D], mel_lengths)."""
        feats, mel_lengths, _ = self._masked_features(audios, audio_lengths)
        return feats, mel_lengths

    def encode(
        self, audios: jnp.ndarray, audio_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audios [B, T] -> (indices [B, G*R, L], feature_lengths [B])."""
        feats, mel_lengths, _ = self._masked_features(audios, audio_lengths)
        indices = self.quantizer.encode(feats)
        return indices, mel_lengths // self.config.downsample_total

    def decode(
        self, indices: jnp.ndarray, feature_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """indices [B, G*R, L] -> (audios [B, L*factor*hop], audio_lengths)."""
        from dmel_codec_tpu.utils.masks import sequence_mask

        cfg = self.config
        factor = cfg.downsample_total
        t_mel = indices.shape[2] * factor
        mel_masks = sequence_mask(feature_lengths * factor, t_mel)[..., None]
        z = self.quantizer.decode(indices)
        z = z * mel_masks.astype(z.dtype)
        audio_lengths = feature_lengths * factor * cfg.hop_length
        audio = self.head(z)
        audio_masks = sequence_mask(audio_lengths, audio.shape[1]).astype(audio.dtype)
        return audio * audio_masks, audio_lengths


# ---------------------------------------------------------------------------
# torch state-dict interop (fish-speech ckpt layout)
# ---------------------------------------------------------------------------


def _wn(sd, prefix):
    if f"{prefix}.weight_v" in sd:
        return sd[f"{prefix}.weight_v"], sd[f"{prefix}.weight_g"]
    return (
        sd[f"{prefix}.parametrizations.weight.original1"],
        sd[f"{prefix}.parametrizations.weight.original0"],
    )


def _wn_conv(sd, prefix):
    v, g = _wn(sd, prefix)
    return {
        "v": tc.conv1d_kernel(v),
        "g": np.asarray(g).reshape(-1),
        "bias": sd[f"{prefix}.bias"],
    }


def _wn_convt(sd, prefix):
    v, g = _wn(sd, prefix)
    return {
        "v": tc.conv_transpose1d_kernel(v),
        "g": np.asarray(g).reshape(-1),
        "bias": sd[f"{prefix}.bias"],
    }


def _plain_conv(sd, prefix):
    return {
        "kernel": tc.conv1d_kernel(sd[f"{prefix}.weight"]),
        "bias": sd[f"{prefix}.bias"],
    }


def hifigan_params_from_torch(sd: dict, config: HiFiGANConfig) -> dict:
    from dmel_codec_tpu.models.codec_convert import convnext_params_from_torch  # noqa

    p: dict = {
        "conv_pre": _wn_conv(sd, "conv_pre"),
        "conv_post": _wn_conv(sd, "conv_post"),
    }
    for i in range(len(config.upsample_rates)):
        p[f"up_{i}"] = _wn_convt(sd, f"ups.{i}")
        if config.use_template:
            p[f"noise_conv_{i}"] = _plain_conv(sd, f"noise_convs.{i}")
        block: dict = {}
        for bi, dil in enumerate(config.resblock_dilation_sizes):
            rb: dict = {}
            for j in range(len(dil)):
                rb[f"conv1_{j}"] = _wn_conv(sd, f"resblocks.{i}.blocks.{bi}.convs1.{j}")
                rb[f"conv2_{j}"] = _wn_conv(sd, f"resblocks.{i}.blocks.{bi}.convs2.{j}")
            block[f"block_{bi}"] = rb
        p[f"resblock_{i}"] = block
    return p


def convnext_encoder_params_from_torch(sd: dict, config: ConvNeXtEncoderConfig) -> dict:
    from dmel_codec_tpu.models.codec_convert import convnext_params_from_torch

    p: dict = {
        "stem_conv": _plain_conv(sd, "downsample_layers.0.0"),
        "stem_norm": {
            "weight": sd["downsample_layers.0.1.weight"],
            "bias": sd["downsample_layers.0.1.bias"],
        },
        "norm": {"weight": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(1, len(config.depths)):
        p[f"mid_norm_{i}"] = {
            "weight": sd[f"downsample_layers.{i}.0.weight"],
            "bias": sd[f"downsample_layers.{i}.0.bias"],
        }
        p[f"mid_proj_{i}"] = {
            "kernel": tc.conv1d_1x1_to_dense(sd[f"downsample_layers.{i}.1.weight"]),
            "bias": sd[f"downsample_layers.{i}.1.bias"],
        }
    for i in range(len(config.depths)):
        for j in range(config.depths[i]):
            p[f"stage_{i}_block_{j}"] = convnext_params_from_torch(
                sd, f"stages.{i}.{j}."
            )
    return p


def firefly_params_from_torch(sd: dict, model: FireflyGAN) -> dict:
    """fish-speech ckpt (generator.-stripped, numpy values) -> flax params."""
    backbone_sd = {
        k[len("backbone.") :]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    head_sd = {k[len("head.") :]: v for k, v in sd.items() if k.startswith("head.")}
    return {
        "backbone": convnext_encoder_params_from_torch(backbone_sd, model.encoder),
        "head": hifigan_params_from_torch(head_sd, model.head),
    }


def firefly_architecture_params_from_torch(
    sd: dict, config: FireflyArchitectureConfig = FireflyArchitectureConfig()
) -> dict:
    """Full fish-speech codec ckpt ("generator."-stripped keys per the
    reference loader, initial_codec.py:314-319) -> FireflyArchitecture params."""
    from dmel_codec_tpu.models.codec_convert import downsample_fsq_params_from_torch

    backbone_sd = {
        k[len("backbone.") :]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    head_sd = {k[len("head.") :]: v for k, v in sd.items() if k.startswith("head.")}
    return {
        "backbone": convnext_encoder_params_from_torch(backbone_sd, config.backbone),
        "head": hifigan_params_from_torch(head_sd, config.head),
        "quantizer": downsample_fsq_params_from_torch(
            sd, "quantizer.", len(config.fsq_downsample), config.fsq_groups
        ),
    }
