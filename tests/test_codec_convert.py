"""VQGAN checkpoint converter: golden sub-path parity + full-tree plumbing.

vector_quantize_pytorch is absent, so the FSQ projections are exercised as
plumbing (synthesized torch-layout keys -> stacked flax params) while every
torch-constructible sub-path (encoder/decoder WaveNets, quantizer
down/upsample conv stages, quality projection, discriminator) is
golden-compared against the reference modules on identical weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import tests.reference_import  # noqa: F401
from dmel_codec.models.modules import wavenet as ref_wavenet
from dmel_codec.models.modules.firefly import ConvNeXtBlock as RefConvNeXtBlock

from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
from dmel_codec_tpu.models.codec_convert import (
    codec_params_from_torch_state_dict,
    convnext_params_from_torch,
    quantizer_params_from_torch,
)
from dmel_codec_tpu.quantize.downsample_fsq import DownsampleFiniteScalarQuantize

CFG = DMelCodecConfig(encoder_layers=3, decoder_layers=3)  # small but flagship-shaped


def _sd(module, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}


def _fake_linear(rng, out_f, in_f):
    return {
        "weight": rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.1,
        "bias": rng.standard_normal(out_f).astype(np.float32) * 0.1,
    }


def _full_fake_state_dict(rng):
    """torch-layout state dict for the whole (small) VQGAN."""
    torch.manual_seed(0)
    sd = {}
    enc = ref_wavenet.WaveNet(
        input_channels=CFG.band_mels,
        residual_channels=CFG.encoder_residual_channels,
        residual_layers=CFG.encoder_layers,
        dilation_cycle=CFG.dilation_cycle,
    )
    sd |= _sd(enc, "encoder.")
    dec = ref_wavenet.WaveNet(
        input_channels=CFG.concat_dim,
        output_channels=CFG.n_mels,
        residual_channels=CFG.concat_dim,
        residual_layers=CFG.decoder_layers,
        dilation_cycle=CFG.dilation_cycle,
        condition_channels=CFG.concat_dim,
    )
    sd |= _sd(dec, "decoder.")

    # quantizer: conv stages from real torch modules, FSQ projections faked
    per_band = CFG.concat_dim // CFG.dmel_groups
    stages = []
    for idx, factor in enumerate(CFG.downsample_factor):
        conv = torch.nn.Conv1d(per_band, per_band, factor, factor)
        block = RefConvNeXtBlock(dim=per_band)
        stages.append((conv, block))
        sd |= _sd(conv, f"quantizer.downsample.{idx}.0.")
        sd |= _sd(block, f"quantizer.downsample.{idx}.1.")
    up_stages = []
    for s, idx in enumerate(reversed(range(len(CFG.downsample_factor)))):
        factor = CFG.downsample_factor[idx]
        convt = torch.nn.ConvTranspose1d(per_band, per_band, factor, factor)
        block = RefConvNeXtBlock(dim=per_band)
        up_stages.append((convt, block))
        sd |= _sd(convt, f"quantizer.upsample.{s}.0.")
        sd |= _sd(block, f"quantizer.upsample.{s}.1.")
    for g in range(CFG.dmel_groups):
        for name, (o, i) in {
            "project_in": (len(CFG.levels), per_band),
            "project_out": (per_band, len(CFG.levels)),
        }.items():
            lin = _fake_linear(rng, o, i)
            sd[f"quantizer.residual_fsq.rvqs.{g}.{name}.weight"] = lin["weight"]
            sd[f"quantizer.residual_fsq.rvqs.{g}.{name}.bias"] = lin["bias"]

    qp = _fake_linear(rng, CFG.concat_dim, 1)
    sd["quality_projection.weight"] = qp["weight"]
    sd["quality_projection.bias"] = qp["bias"]
    return sd, enc, dec, stages, up_stages


def test_full_codec_conversion(rng):
    sd, enc, dec, stages, up_stages = _full_fake_state_dict(rng)
    params = codec_params_from_torch_state_dict(sd, CFG)
    model = DMelCodec(config=CFG)

    # 1) whole converted tree drives the public API without shape errors
    b, t = 2, 16
    mels = jnp.asarray(rng.standard_normal((b, t, CFG.n_mels)).astype(np.float32))
    idx, lengths = model.apply(
        {"params": params}, mels, jnp.array([t, t]), method=DMelCodec.encode
    )
    assert idx.shape == (b, CFG.num_codebook_rows, t // 4)
    noise = jnp.zeros((b, t, CFG.concat_dim))
    out = model.apply({"params": params}, idx, lengths, noise, method=DMelCodec.decode)
    assert out.shape == (b, t, CFG.n_mels)

    # 2) encoder golden parity through the converted tree
    bands = rng.standard_normal((4, CFG.band_mels, 24)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(bands)).numpy()
    got = model.apply(
        {"params": params},
        jnp.asarray(bands.transpose(0, 2, 1)),
        method=lambda m, x: m.encoder(x),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=3e-5, rtol=1e-4
    )

    # 3) decoder golden parity (with condition)
    x = rng.standard_normal((2, CFG.concat_dim, 12)).astype(np.float32)
    cond = rng.standard_normal((2, CFG.concat_dim, 12)).astype(np.float32)
    with torch.no_grad():
        want = dec(torch.from_numpy(x), condition=torch.from_numpy(cond)).numpy()
    got = model.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(cond.transpose(0, 2, 1)),
        method=lambda m, a, c: m.decoder(a, condition=c),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=3e-5, rtol=1e-4
    )

    # 4) quantizer down/upsample conv stages golden parity
    per_band = CFG.concat_dim // CFG.dmel_groups
    z = rng.standard_normal((3, per_band, 16)).astype(np.float32)
    with torch.no_grad():
        zt = torch.from_numpy(z)
        for conv, block in stages:
            zt = block(conv(zt))
        want_down = zt.numpy()
        for convt, block in up_stages:
            zt = block(convt(zt))
        want_up = zt.numpy()
    qparams = params["quantizer"]
    quant = DownsampleFiniteScalarQuantize(
        input_dim=CFG.concat_dim,
        n_codebooks=CFG.n_codebooks,
        n_groups=CFG.dmel_groups,
        levels=CFG.levels,
        downsample_factor=CFG.downsample_factor,
        is_dmel=True,
    )
    got_down = quant.apply(
        {"params": qparams},
        jnp.asarray(z.transpose(0, 2, 1)),
        method=lambda m, x: m._downsample(x),
    )
    np.testing.assert_allclose(
        np.asarray(got_down).transpose(0, 2, 1), want_down, atol=3e-5, rtol=1e-4
    )
    got_up = quant.apply(
        {"params": qparams},
        got_down,
        method=lambda m, x: m._upsample(x),
    )
    np.testing.assert_allclose(
        np.asarray(got_up).transpose(0, 2, 1), want_up, atol=3e-5, rtol=1e-4
    )

    # 5) quality projection
    q = jnp.asarray([[1.5], [2.0]])
    got_q = model.apply(
        {"params": params}, q, method=lambda m, v: m.quality_projection(v)
    )
    want_q = q @ sd["quality_projection.weight"].T + sd["quality_projection.bias"]
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q), atol=1e-5)
