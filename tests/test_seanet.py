"""Golden parity for the native SEANet+RVQ family (EnCodec/SpeechTokenizer).

HF transformers ships `EncodecModel` — the same architecture lineage
SpeechTokenizer extends (SEANet + residual VQ, arXiv:2308.16692) — so the
conv padding rules, resblock wiring, LSTM recurrence, and RVQ search are
validated numerically against real torch outputs, not just invariants.
Reference capability: evaluation/initial_codec.py:25-31 (speechtokenizer),
:6 (encodec listed in the same zoo).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmel_codec_tpu.models.seanet import (
    SEANetConfig,
    SpeechTokenizer,
    load_speechtokenizer,
    speechtokenizer_params_from_torch,
)

torch = pytest.importorskip("torch")


def _tiny_hf_encodec(causal: bool):
    from transformers import EncodecConfig, EncodecModel

    cfg = EncodecConfig(
        audio_channels=1,
        num_filters=4,
        num_residual_layers=1,
        upsampling_ratios=[4, 2],
        hidden_size=16,
        num_lstm_layers=1,
        codebook_size=32,
        use_causal_conv=causal,
        normalize=False,
        target_bandwidths=[100.0],
        sampling_rate=16000,
    )
    torch.manual_seed(0)
    model = EncodecModel(cfg).eval()
    # HF initializes RVQ codebooks to zeros (they are EMA buffers);
    # randomize so nearest-neighbour search is meaningful
    sd = model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k in list(sd):
        if k.endswith("codebook.embed"):
            sd[k] = torch.randn(sd[k].shape, generator=g)
    model.load_state_dict(sd)
    ours_cfg = SEANetConfig(
        sample_rate=16000,
        n_filters=4,
        dimension=16,
        ratios=(4, 2),
        lstm_layers=1,
        bidirectional=False,
        causal=causal,
        n_q=cfg.num_quantizers,
        codebook_size=32,
        semantic_dimension=None,
    )
    return model, ours_cfg


@pytest.mark.parametrize("causal", [True, False])
def test_seanet_matches_hf_encodec(rng, causal):
    """Encoder latents, RVQ codes, and decoded audio must match HF
    EncodecModel bit-for-tolerance on converted weights."""
    model, cfg = _tiny_hf_encodec(causal)
    ours = SpeechTokenizer(config=cfg)
    params = speechtokenizer_params_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()},
        cfg,
        hf_naming=True,
    )

    t = 8 * 13 + 5  # deliberately not a multiple of the hop (pads matter)
    x = (rng.standard_normal((2, t)) * 0.3).astype(np.float32)
    xt = torch.from_numpy(x).unsqueeze(1)

    with torch.no_grad():
        emb_t = model.encoder(xt)
        codes_t = model.quantizer.encode(emb_t)  # [Q, B, L]
        feats_t = model.quantizer.decode(codes_t)
        wav_t = model.decoder(feats_t)

    emb_j = ours.apply(
        {"params": params}, jnp.asarray(x), method=SpeechTokenizer.encode_unquantized
    )
    np.testing.assert_allclose(
        np.asarray(emb_j), emb_t.numpy().transpose(0, 2, 1), atol=2e-4, rtol=1e-4
    )

    codes_j = ours.apply(
        {"params": params}, jnp.asarray(x), method=SpeechTokenizer.encode
    )
    np.testing.assert_array_equal(np.asarray(codes_j), codes_t.numpy())

    wav_j = ours.apply(
        {"params": params}, jnp.asarray(codes_j), method=SpeechTokenizer.decode
    )
    np.testing.assert_allclose(
        np.asarray(wav_j), wav_t.numpy()[:, 0, :], atol=2e-4, rtol=1e-4
    )


def test_bilstm_matches_torch(rng):
    """The bidirectional SLSTM (SpeechTokenizer's encoder bottleneck) must
    match torch.nn.LSTM(bidirectional=True) + the concat-skip."""
    from dmel_codec_tpu.models.seanet import SLSTM

    d, t, b = 6, 11, 3
    torch.manual_seed(2)
    lstm_t = torch.nn.LSTM(d, d, num_layers=2, bidirectional=True)
    x = rng.standard_normal((b, t, d)).astype(np.float32)

    with torch.no_grad():
        y_t, _ = lstm_t(torch.from_numpy(x).permute(1, 0, 2))
        # speechtokenizer SLSTM skip: y + cat([x, x])
        skip = torch.cat([torch.from_numpy(x)] * 2, dim=-1)
        y_t = y_t.permute(1, 0, 2) + skip

    params = {
        k: jnp.asarray(v.detach().numpy())
        for k, v in lstm_t.named_parameters()
    }
    mod = SLSTM(features=d, num_layers=2, bidirectional=True)
    y_j = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=2e-5, rtol=1e-4)


def test_original_package_naming_converter():
    """Renaming an HF state_dict into the original speechtokenizer/encodec
    layout (encoder.model.N.conv.conv.weight_g/v ...) and converting with
    hf_naming=False must give the identical param tree."""
    model, cfg = _tiny_hf_encodec(causal=False)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    renamed = {}
    for k, v in sd.items():
        nk = (
            k.replace("encoder.layers.", "encoder.model.")
            .replace("decoder.layers.", "decoder.model.")
            .replace(".parametrizations.weight.original0", ".weight_g")
            .replace(".parametrizations.weight.original1", ".weight_v")
        )
        if "quantizer.layers." in nk:
            nk = nk.replace("quantizer.layers.", "quantizer.vq.layers.").replace(
                ".codebook.", "._codebook."
            )
        elif ".conv." in nk:
            # decide conv vs convtr by position: decoder upsamplers are
            # ConvTranspose1d (model.3, model.6 for 2 ratios) -> convtr.convtr
            parts = nk.split(".")
            tower, idx = parts[0], int(parts[2])
            is_up = tower == "decoder" and idx in (3, 6)
            inner = "convtr.convtr" if is_up else "conv.conv"
            head, _, tail = nk.rpartition(".conv.")
            nk = head + "." + inner + "." + tail
        renamed[nk] = v

    p_hf = speechtokenizer_params_from_torch(sd, cfg, hf_naming=True)
    p_orig = speechtokenizer_params_from_torch(renamed, cfg, hf_naming=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_hf,
        p_orig,
    )


def test_speechtokenizer_api_surface(rng, tmp_path):
    """Flagship-shaped (scaled-down) SpeechTokenizer: config.json loader,
    encode/decode/forward_feature/semantic surfaces, st offsets."""
    import json

    cfg_json = {
        "n_filters": 4,
        "strides": [4, 2],
        "dimension": 16,
        "semantic_dimension": 8,
        "bidirectional": True,
        "dilation_base": 2,
        "residual_kernel_size": 3,
        "n_residual_layers": 1,
        "lstm_layers": 2,
        "codebook_size": 32,
        "n_q": 4,
        "sample_rate": 16000,
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(cfg_json))
    model, params, cfg = load_speechtokenizer(str(path))
    assert params is None and cfg.bidirectional and cfg.hop_length == 8

    x = (rng.standard_normal((2, 8 * 12)) * 0.3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    codes = model.apply({"params": params}, jnp.asarray(x), method=SpeechTokenizer.encode)
    assert codes.shape == (4, 2, 12)  # [n_q, B, L] — the package's layout
    assert int(codes.max()) < 32 and int(codes.min()) >= 0

    wav = model.apply({"params": params}, codes, method=SpeechTokenizer.decode)
    assert wav.shape == (2, 8 * 12)

    # RVQ additivity: decode(codes) == sum of per-layer features -> decoder
    per_layer = model.apply(
        {"params": params}, jnp.asarray(x), method=SpeechTokenizer.forward_feature
    )
    assert per_layer.shape == (4, 2, 12, 16)
    feats = model.apply(
        {"params": params}, codes, method=lambda m, c: m.quantizer.decode(c)
    )
    np.testing.assert_allclose(
        np.asarray(per_layer.sum(0)), np.asarray(feats), atol=1e-5
    )

    sem = model.apply(
        {"params": params}, jnp.asarray(x), method=SpeechTokenizer.semantic_features
    )
    assert sem.shape == (2, 12, 8)

    # st offset: RVQ-rest tokens (st=1) decode with the layer-1.. codebooks
    rest = model.apply(
        {"params": params},
        jnp.asarray(x),
        method=lambda m, a: m.quantizer.encode(m.encode_unquantized(a), st=1),
    )
    assert rest.shape == (3, 2, 12)
