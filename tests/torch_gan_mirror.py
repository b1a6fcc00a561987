"""Torch mirror of the reference VQGAN training step, for cross-framework
TRAINING parity (not a test file — imported by tests/test_train_parity.py and
scripts/parity_train_step.py).

The reference's training step (codec_lit_modules.py:159-327) cannot run
verbatim here: it is a LightningModule (needs a Trainer for optimizers/
manual_backward) and its quantizer imports `vector_quantize_pytorch`, which
is absent in this environment. This module rebuilds the SAME step from the
reference's own importable torch modules (WaveNet, ConvNeXtBlock,
Discriminator, cosine schedule) plus a torch GroupedResidualFSQ mirror
implementing the library's exact algorithm — the identical algorithm the
numpy oracle in tests/test_fsq_golden.py transcribes and the JAX quantizer
is bit-identical to (indices) on. State-dict key layout matches the
reference checkpoints so models/codec_convert.py converts it unchanged.

Step ordering mirrored exactly (codec_lit_modules.py:159-327):
  mel extraction no-grad -> quality scalar (:173-174) -> masks -> dMel view
  (:186-190) -> encode -> FSQ -> quality-conditioned noise decode (:199-211)
  -> discriminator LSGAN update first, clip 1000 (:214-244) -> band-weighted
  mel L1 (0.6/0.3/0.1 x 0.5 + full x 0.5, :246-263) -> adversarial loss
  against the UPDATED discriminator (:266-267) -> generator update -> both
  LambdaLR schedulers step (:314-327).
"""

from __future__ import annotations

import numpy as np
import torch
from torch import nn

import tests.reference_import  # noqa: F401
from dmel_codec.models.modules.discriminator import Discriminator as RefDiscriminator
from dmel_codec.models.modules.firefly import ConvNeXtBlock as RefConvNeXtBlock
from dmel_codec.models.modules.wavenet import WaveNet as RefWaveNet
from dmel_codec.utils.schedule import get_cosine_schedule_with_warmup_lr_lambda

from dmel_codec_tpu.models.codec import DMelCodecConfig


def _round_ste(z: torch.Tensor) -> torch.Tensor:
    return z + (torch.round(z) - z).detach()


class TorchResidualFSQ(nn.Module):
    """vector_quantize_pytorch ResidualFSQ semantics (training forward),
    parameter names matching `rvqs.{g}.project_{in,out}` checkpoint keys."""

    def __init__(self, dim: int, levels, num_quantizers: int):
        super().__init__()
        codebook_dim = len(levels)
        self.num_quantizers = num_quantizers
        self.project_in = nn.Linear(dim, codebook_dim)
        self.project_out = nn.Linear(codebook_dim, dim)
        lv = torch.tensor(levels, dtype=torch.float32)
        self.register_buffer("levels_f", lv)
        self.register_buffer(
            "basis",
            torch.tensor(
                np.concatenate(([1], np.cumprod(levels[:-1]))).astype(np.int64)
            ),
        )

    def bound(self, z: torch.Tensor, eps: float = 1e-3) -> torch.Tensor:
        half_l = (self.levels_f - 1) * (1 + eps) / 2
        offset = torch.where(
            self.levels_f % 2 == 0,
            torch.tensor(0.5, dtype=z.dtype),
            torch.tensor(0.0, dtype=z.dtype),
        )
        shift = torch.atanh(offset / half_l)
        return torch.tanh(z + shift) * half_l - offset

    def quantize(self, z: torch.Tensor) -> torch.Tensor:
        half_width = torch.div(self.levels_f, 2, rounding_mode="floor")
        return _round_ste(self.bound(z)) / half_width

    def codes_to_indices(self, codes: torch.Tensor) -> torch.Tensor:
        half_width = torch.div(self.levels_f, 2, rounding_mode="floor")
        z = codes * half_width + half_width
        return (z * self.basis).sum(-1).long()

    def forward(self, x: torch.Tensor):
        """x [..., dim] -> (quantized [..., dim], indices [..., R])."""
        x = self.project_in(x)
        quantized_out = torch.zeros_like(x)
        residual = self.bound(x)  # residual_fsq.py: first(layers).bound(x)
        all_indices = []
        for i in range(self.num_quantizers):
            scale = (self.levels_f - 1.0) ** (-float(i))
            codes = self.quantize(residual / scale)
            all_indices.append(self.codes_to_indices(codes.detach()))
            codes = codes * scale
            residual = residual - codes.detach()
            quantized_out = quantized_out + codes
        return self.project_out(quantized_out), torch.stack(all_indices, -1)


class TorchGroupedResidualFSQ(nn.Module):
    def __init__(self, dim: int, levels, num_quantizers: int, groups: int):
        super().__init__()
        self.groups = groups
        self.rvqs = nn.ModuleList(
            TorchResidualFSQ(dim // groups, levels, num_quantizers)
            for _ in range(groups)
        )

    def forward(self, x: torch.Tensor):
        """x [B, L, dim] -> (quantized [B, L, dim], indices [G, B, L, R])."""
        chunks = x.chunk(self.groups, dim=-1)
        outs, inds = zip(*(rvq(c) for rvq, c in zip(self.rvqs, chunks)))
        return torch.cat(outs, dim=-1), torch.stack(inds)


class TorchDownsampleFSQ(nn.Module):
    """Reference DownsampleFiniteScalarQuantize (dowmsample_fsq.py:19-122),
    is_dmel=True path, with the FSQ mirror above."""

    def __init__(self, input_dim, n_codebooks, n_groups, levels, downsample_factor):
        super().__init__()
        self.groups = n_groups
        per = input_dim // n_groups
        all_dims = (per,) + tuple(per for _ in downsample_factor)
        self.residual_fsq = TorchGroupedResidualFSQ(
            dim=input_dim, levels=levels, num_quantizers=n_codebooks, groups=n_groups
        )
        self.downsample = nn.Sequential(
            *[
                nn.Sequential(
                    nn.Conv1d(all_dims[i], all_dims[i + 1], f, f),
                    RefConvNeXtBlock(dim=all_dims[i + 1]),
                )
                for i, f in enumerate(downsample_factor)
            ]
        )
        self.upsample = nn.Sequential(
            *[
                nn.Sequential(
                    nn.ConvTranspose1d(all_dims[i + 1], all_dims[i], f, f),
                    RefConvNeXtBlock(dim=all_dims[i]),
                )
                for i, f in reversed(list(enumerate(downsample_factor)))
            ]
        )
        self.apply(self._init_weights)

    @staticmethod
    def _init_weights(m):
        if isinstance(m, (nn.Conv1d, nn.Linear)):
            nn.init.kaiming_uniform_(m.weight, mode="fan_in", nonlinearity="leaky_relu")
            nn.init.constant_(m.bias, 0)

    def forward(self, z: torch.Tensor) -> torch.Tensor:
        """z [(B*G), F, T] -> quantized features [(B*G), F, T] (the `.z`
        field of the reference FSQResult; dowmsample_fsq.py:86-122)."""
        original_shape = z.shape
        z = self.downsample(z)
        # (b g) f t -> b (g f) t  (contiguous-view regroup, :93)
        z = z.contiguous().view(
            original_shape[0] // self.groups, self.groups * original_shape[1], -1
        )
        quantized, _ = self.residual_fsq(z.mT)
        out = quantized.mT
        # b (g f) t -> (b g) f t  (:102)
        out = out.contiguous().view(original_shape[0], original_shape[1], -1)
        out = self.upsample(out)
        out = out.contiguous().view(
            original_shape[0] // self.groups, self.groups * original_shape[1], -1
        )
        diff = original_shape[-1] - out.shape[-1]
        left = diff // 2
        right = diff - left
        if diff > 0:
            out = torch.nn.functional.pad(out, (left, right))
        elif diff < 0:
            out = out[..., left:-right]
        return out  # [B, G*F, T] — the regrouped FSQResult.z (:100-120)


def _sequence_mask(lengths: torch.Tensor, max_len: int) -> torch.Tensor:
    x = torch.arange(max_len, dtype=lengths.dtype)
    return (x[None, :] < lengths[:, None]).float()


def _avg_with_mask(x: torch.Tensor, mask: torch.Tensor) -> torch.Tensor:
    if mask.shape[1] == 1:
        mask = mask.expand_as(x)
    return (x * mask).sum() / mask.sum()


class TorchVQGANMirror(nn.Module):
    """Module container whose state_dict matches reference VQGAN keys."""

    def __init__(self, cfg: DMelCodecConfig):
        super().__init__()
        self.cfg = cfg
        self.encoder = RefWaveNet(
            input_channels=cfg.band_mels,
            residual_channels=cfg.encoder_residual_channels,
            residual_layers=cfg.encoder_layers,
            dilation_cycle=cfg.dilation_cycle,
        )
        self.quantizer = TorchDownsampleFSQ(
            input_dim=cfg.concat_dim,
            n_codebooks=cfg.n_codebooks,
            n_groups=cfg.dmel_groups,
            levels=cfg.levels,
            downsample_factor=cfg.downsample_factor,
        )
        self.decoder = RefWaveNet(
            input_channels=cfg.concat_dim,
            output_channels=cfg.n_mels,
            residual_channels=cfg.concat_dim,
            residual_layers=cfg.decoder_layers,
            dilation_cycle=cfg.dilation_cycle,
            condition_channels=cfg.concat_dim,
        )
        self.quality_projection = nn.Linear(1, cfg.concat_dim)
        self.discriminator = RefDiscriminator()


class TorchGanStepMirror:
    """N-step driver with the reference's optimizers/schedulers/ordering."""

    def __init__(
        self,
        model: TorchVQGANMirror,
        lr: float = 1e-5,
        betas=(0.8, 0.99),
        eps: float = 1e-5,
        weight_decay: float = 0.01,
        num_warmup_steps: int = 100,
        num_training_steps: int = 1_000_000,
        final_lr_ratio: float = 0.01,
        weight_mel: float = 1.0,
        weight_adv: float = 0.2,
        weight_vq: float = 1.0,
    ):
        self.model = model
        self.weight_mel, self.weight_adv, self.weight_vq = (
            weight_mel,
            weight_adv,
            weight_vq,
        )
        gen_params = (
            list(model.encoder.parameters())
            + list(model.quantizer.parameters())
            + list(model.decoder.parameters())
            + list(model.quality_projection.parameters())
        )
        mk = lambda ps: torch.optim.AdamW(
            ps, lr=lr, betas=betas, eps=eps, weight_decay=weight_decay
        )
        self.optim_g = mk(gen_params)
        self.optim_d = mk(list(model.discriminator.parameters()))
        lam = lambda step: get_cosine_schedule_with_warmup_lr_lambda(
            step,
            num_warmup_steps=num_warmup_steps,
            num_training_steps=num_training_steps,
            final_lr_ratio=final_lr_ratio,
        )
        self.sched_g = torch.optim.lr_scheduler.LambdaLR(self.optim_g, lam)
        self.sched_d = torch.optim.lr_scheduler.LambdaLR(self.optim_d, lam)
        self._gen_params = gen_params

    def step(
        self,
        encode_mels: torch.Tensor,  # [B, M, T] log-mels (precomputed; no-grad in ref)
        gt_mels: torch.Tensor,  # [B, M, T]
        mel_lengths: torch.Tensor,  # [B]
        noise: torch.Tensor,  # [B, concat, T] decoder noise (randn_like in ref)
    ) -> dict:
        m = self.model
        cfg = m.cfg
        G = cfg.dmel_groups

        quality = (((gt_mels.mean(-1) > -8).sum(-1) - 90) / 10).float()[:, None]
        mel_masks = _sequence_mask(mel_lengths, gt_mels.shape[2])
        mask = mel_masks[:, None, :]  # [B, 1, T]
        gt_mels = gt_mels * mask

        b, num_mels, t = encode_mels.shape
        dmask = mask.repeat_interleave(G, dim=0)
        dmels = encode_mels.contiguous().view(b * G, num_mels // G, t) * dmask
        features = m.encoder(dmels) * dmask

        vq_z = m.quantizer(features) * mask  # [B, concat, T]
        vq_recon = vq_z + m.quality_projection(quality)[:, :, None]

        gen_mel = (
            m.decoder(noise * mask, condition=vq_recon * mask) * mask
        )

        # --- discriminator first (ref :214-244) ---------------------------
        real_logits = m.discriminator(gt_mels)
        fake_logits = m.discriminator(gen_mel.detach())
        d_mask = torch.nn.functional.interpolate(
            mask, size=(real_logits.shape[2],), mode="nearest"
        )
        loss_real = _avg_with_mask((real_logits - 1) ** 2, d_mask)
        loss_fake = _avg_with_mask(fake_logits**2, d_mask)
        loss_d = loss_real + loss_fake
        self.optim_d.zero_grad()
        loss_d.backward()
        d_norm = torch.nn.utils.clip_grad_norm_(
            m.discriminator.parameters(), 1000.0
        )
        self.optim_d.step()
        self.sched_d.step()

        # --- generator (ref :246-327) -------------------------------------
        dist = (gen_mel - gt_mels).abs()
        loss_mel = (
            _avg_with_mask(dist[:, :40, :], mask) * 0.6
            + _avg_with_mask(dist[:, 40:70, :], mask) * 0.3
            + _avg_with_mask(dist[:, 70:, :], mask) * 0.1
        ) * 0.5 + _avg_with_mask(dist, mask) * 0.5
        fake_logits2 = m.discriminator(gen_mel)
        loss_adv = _avg_with_mask((fake_logits2 - 1) ** 2, d_mask)
        loss_g = self.weight_mel * loss_mel + self.weight_adv * loss_adv
        self.optim_g.zero_grad()
        loss_g.backward()
        g_norm = torch.nn.utils.clip_grad_norm_(self._gen_params, 1000.0)
        self.optim_g.step()
        self.sched_g.step()

        return {
            "train/discriminator/loss": float(loss_d),
            "train/discriminator/loss_real": float(loss_real),
            "train/discriminator/loss_fake": float(loss_fake),
            "train/generator/loss": float(loss_g),
            "train/generator/loss_mel": float(loss_mel),
            "train/generator/loss_adv": float(loss_adv),
            "train/grad_norm/generator": float(g_norm),
            "train/grad_norm/discriminator": float(d_norm),
        }
