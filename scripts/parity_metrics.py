"""PARITY metrics: reference torch pipeline vs this framework, same weights.

Turns the north star's "PESQ/mel-distance parity" from a token-level claim
into a measured metric table (VERDICT r3 item 7): golden-convert a
random-init reference codec + BigVGAN (the reference chain of
codec_lit_modules.py:462-531 + bigvgan.py), reconstruct the SAME clips in
both frameworks, and report native PESQ / STOI / mel-L1 per framework plus
the torch-vs-JAX deltas and cross-framework waveform agreement.

Runs on host CPU only (torch has no TPU; JAX is pinned to cpu) — framework
equivalence is a numerics property, not a hardware one.

    JAX_PLATFORMS=cpu python scripts/parity_metrics.py
"""

from __future__ import annotations

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import tests.reference_import  # noqa: F401  (sys.path to /root/reference)
from tests.test_full_pipeline_golden import _OracleGroupedResidualFSQ

if "vector_quantize_pytorch" not in sys.modules:
    _mod = types.ModuleType("vector_quantize_pytorch")
    _mod.GroupedResidualFSQ = _OracleGroupedResidualFSQ
    sys.modules["vector_quantize_pytorch"] = _mod

from dmel_codec.models.modules.bigvgan.bigvgan import BigVGAN as RefBigVGAN
from dmel_codec.models.modules.bigvgan.env import AttrDict
from dmel_codec.models.modules.dowmsample_fsq import (
    DownsampleFiniteScalarQuantize as RefQuantizer,
)
from dmel_codec.models.modules.wavenet import WaveNet as RefWaveNet

import jax.numpy as jnp

from dmel_codec_tpu.data.audio import resample_audio
from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram
from dmel_codec_tpu.eval.metrics import mel_l1_distance, si_snr, stoi
from dmel_codec_tpu.eval.pesq_native import pesq_wb
from dmel_codec_tpu.models.bigvgan import (
    BigVGAN,
    BigVGANConfig,
    params_from_torch_state_dict,
)
from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
from dmel_codec_tpu.models.codec_convert import codec_params_from_torch_state_dict

SR = 24000

# Flagship mel geometry (100 mels, hop 256 @ 24 kHz) with reduced widths so
# the torch side stays tractable on this single-core host; the numerics
# being compared (converted weights, op chains, metric stack) are identical
# in kind to the flagship.
VOC = dict(
    num_mels=100,
    upsample_rates=(4, 4, 2, 2, 2, 2),
    upsample_kernel_sizes=(8, 8, 4, 4, 4, 4),
    upsample_initial_channel=256,
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    snake_logscale=True,
    use_bias_at_final=False,
    use_tanh_at_final=False,
)


def make_clips(n_samples: int) -> list[np.ndarray]:
    t = np.arange(n_samples) / SR
    rng = np.random.default_rng(7)
    tones = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1200 * t)
    chirp = 0.4 * np.sin(2 * np.pi * (200 * t + 0.5 * (3800 / t[-1]) * t * t))
    f0 = 140 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    voiced = sum(0.3 / k * np.sin(k * phase) for k in range(1, 6))
    speechish = voiced * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)) + 0.02 * rng.standard_normal(n_samples)
    return [c.astype(np.float32) for c in (tones, chirp, speechish)]


def build_reference(cfg: DMelCodecConfig):
    torch.manual_seed(0)
    enc = RefWaveNet(
        input_channels=cfg.band_mels,
        residual_channels=cfg.encoder_residual_channels,
        residual_layers=cfg.encoder_layers,
        dilation_cycle=cfg.dilation_cycle,
    ).eval()
    quant = RefQuantizer(
        input_dim=cfg.concat_dim,
        n_codebooks=cfg.n_codebooks,
        n_groups=cfg.dmel_groups,
        levels=cfg.levels,
        downsample_factor=cfg.downsample_factor,
        is_dmel=True,
    ).eval()
    dec = RefWaveNet(
        input_channels=cfg.concat_dim,
        output_channels=cfg.n_mels,
        residual_channels=cfg.concat_dim,
        residual_layers=cfg.decoder_layers,
        dilation_cycle=cfg.dilation_cycle,
        condition_channels=cfg.concat_dim,
    ).eval()
    torch.nn.init.normal_(dec.output_projection.conv.weight, std=0.02)
    qproj = torch.nn.Linear(1, cfg.concat_dim).eval()
    voc = RefBigVGAN(
        h=AttrDict(**{k: list(v) if isinstance(v, tuple) else v for k, v in VOC.items()},
                   resblock="1", activation="snakebeta")
    ).eval()
    return enc, quant, dec, qproj, voc


def main() -> None:
    cfg = DMelCodecConfig(encoder_residual_channels=16, encoder_layers=4,
                          decoder_layers=4)
    enc, quant, dec, qproj, voc = build_reference(cfg)

    # golden conversion (same converters the checkpoint CLI uses)
    sd = {}
    for name, mod in (("encoder", enc), ("quantizer", quant), ("decoder", dec),
                      ("quality_projection", qproj)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v.numpy()
    params = codec_params_from_torch_state_dict(sd, cfg)
    vcfg = BigVGANConfig(**VOC, resblock="1", activation="snakebeta")
    vparams = params_from_torch_state_dict(
        {k: v.detach().numpy() for k, v in voc.state_dict().items()}, vcfg
    )

    model = DMelCodec(config=cfg)
    jvoc = BigVGAN(config=vcfg)
    mel_tf = LogMelSpectrogram()

    n = SR  # 1 s clips
    clips = make_clips(n)
    rng = np.random.default_rng(3)

    rows = []
    for ci, clip in enumerate(clips):
        mels = np.asarray(mel_tf(jnp.asarray(clip[None, :])))
        frames = (mels.shape[1] // cfg.downsample_total) * cfg.downsample_total
        mels = mels[:, :frames]
        b, g = 1, cfg.dmel_groups
        noise = rng.standard_normal((b, cfg.concat_dim, frames)).astype(np.float32)

        # ---- torch reference chain -> waveform
        with torch.no_grad():
            mt = torch.from_numpy(mels.transpose(0, 2, 1)).contiguous()
            feats = enc(mt.view(b * g, cfg.n_mels // g, frames))
            idx_t = quant.encode(feats)
            z = quant.decode(idx_t)
            z = z + qproj(torch.ones(b, 1) * 2)[:, :, None]
            gen_mel_t = dec(torch.from_numpy(noise), condition=z)
            wav_t = voc(gen_mel_t).numpy()[0, 0]

        # ---- this framework on converted weights -> waveform
        lengths = jnp.full((b,), frames, jnp.int32)
        idx_j, idx_len = model.apply(
            {"params": params}, jnp.asarray(mels), lengths, method=DMelCodec.encode
        )
        assert np.array_equal(np.asarray(idx_j), idx_t.numpy().astype(np.int32)), (
            "token interchange broke — parity table would be meaningless"
        )
        gen_mel_j = model.apply(
            {"params": params}, idx_j, idx_len,
            jnp.asarray(noise.transpose(0, 2, 1)), method=DMelCodec.decode,
        )
        wav_j = np.asarray(jvoc.apply({"params": vparams}, gen_mel_j))[0]

        m = min(len(wav_t), len(wav_j), n)
        ref, wt, wj = clip[:m], wav_t[:m], wav_j[:m]
        # PESQ-wb is defined at 16 kHz — resample like the reference does
        # (evaluation_utils.py:154-187 resamples to 16k before pesq)
        ref16, wt16, wj16 = (
            resample_audio(v.astype(np.float32), SR, 16000) for v in (ref, wt, wj)
        )
        row = dict(
            clip=["tones", "chirp", "speech-like"][ci],
            pesq_t=pesq_wb(ref16, wt16, sample_rate=16000),
            pesq_j=pesq_wb(ref16, wj16, sample_rate=16000),
            stoi_t=stoi(ref, wt, SR),
            stoi_j=stoi(ref, wj, SR),
            mel_t=mel_l1_distance(ref, wt, SR),
            mel_j=mel_l1_distance(ref, wj, SR),
            # cross-framework: torch output as the reference signal — the
            # direct "are the two frameworks the same codec" measurement
            xpesq=pesq_wb(wt16, wj16, sample_rate=16000),
            xmel=mel_l1_distance(wt, wj, SR),
            xsnr=si_snr(wt, wj),
            maxabs=float(np.abs(wt - wj).max()),
        )
        rows.append(row)
        print(
            f"{row['clip']:12s} PESQ {row['pesq_t']:.4f}/{row['pesq_j']:.4f} "
            f"(d {row['pesq_j']-row['pesq_t']:+.4f})  "
            f"STOI {row['stoi_t']:.4f}/{row['stoi_j']:.4f} "
            f"(d {row['stoi_j']-row['stoi_t']:+.4f})  "
            f"melL1 {row['mel_t']:.4f}/{row['mel_j']:.4f} "
            f"(d {row['mel_j']-row['mel_t']:+.4f})  "
            f"x-PESQ {row['xpesq']:.3f}  x-melL1 {row['xmel']:.4f}  "
            f"xSI-SNR {row['xsnr']:6.1f} dB  maxabs {row['maxabs']:.2e}",
            flush=True,
        )

    dp = max(abs(r["pesq_j"] - r["pesq_t"]) for r in rows)
    ds = max(abs(r["stoi_j"] - r["stoi_t"]) for r in rows)
    dm = max(abs(r["mel_j"] - r["mel_t"]) for r in rows)
    print(f"\nmax |delta| vs original clip: PESQ {dp:.4f}  STOI {ds:.4f}  "
          f"mel-L1 {dm:.4f}")
    # Gate on the DIRECT cross-framework comparison. The vs-original-clip
    # STOI/mel-L1 deltas are reported but not gated: random-init codec
    # output is noise-like (PESQ 1.4-2.0, STOI ~0), where STOI is defined
    # on near-zero correlations and log-mel sits at the 1e-5 clamp floor —
    # both amplify an O(1e-4) waveform difference into O(0.1) metric
    # swings that say nothing about framework equivalence. PESQ's deltas
    # stay stable (gated); the framework question itself is measured
    # head-to-head: torch output as reference signal for the JAX output.
    xsnr = min(r["xsnr"] for r in rows)
    xpesq = min(r["xpesq"] for r in rows)
    xmel = max(r["xmel"] for r in rows)
    print(f"cross-framework (torch as ref): min PESQ {xpesq:.3f} "
          f"(ceiling 4.64)  max mel-L1 {xmel:.4f}  min SI-SNR {xsnr:.1f} dB")
    # x-mel-L1 is a gross-artifact catch only (0.5, not a tight bound):
    # random-init outputs have many near-silent mel bands where the 1e-5
    # log floor turns an O(1e-4) waveform delta into O(0.3) log-mel L1.
    ok = dp < 0.05 and xsnr > 30.0 and xpesq > 4.5 and xmel < 0.5
    print("PARITY " + ("OK" if ok else "BREACH"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
