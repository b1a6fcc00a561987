"""Native ECAPA-TDNN: converter key contract, embedding wiring, and the
full evaluation-harness column set executing end-to-end.

Real speechbrain voxceleb weights are not available in this environment, so
embedding-level parity cannot be asserted; these tests prove everything
that CAN be proven without weights: the torch-key converter consumes
speechbrain's exact state-dict layout, the forward produces well-formed
embeddings at flagship and reduced sizes, masking behaves, and the
Evaluation harness emits every reference column (evaluation.py:113-159)
including spk_sim through the native path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmel_codec_tpu.eval import ecapa


def _small_params(seed=0):
    # reduced widths for CPU speed; same tree/topology as voxceleb flagship
    return ecapa.init_ecapa_params(
        jax.random.PRNGKey(seed),
        channels=32,
        emb_dim=16,
        res2net_scale=4,
        se_channels=8,
        attn_channels=8,
    )


def _synthetic_speechbrain_sd(rng, channels=32, scale=4, se=8, attn=8, emb=16):
    """Random state dict in speechbrain ECAPA_TDNN's exact key layout."""
    sd = {}

    def conv(prefix, cout, cin, k):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin, k)).astype(
            np.float32
        )
        sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(
            rng.standard_normal(c)
        ).astype(np.float32) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.int64(100)

    def tdnn(prefix, cout, cin, k):
        conv(f"{prefix}.conv.conv", cout, cin, k)
        bn(f"{prefix}.norm.norm", cout)

    tdnn("blocks.0", channels, 80, 5)
    w = channels // scale
    for li, k in zip((1, 2, 3), (3, 3, 3)):
        tdnn(f"blocks.{li}.tdnn1", channels, channels, 1)
        for i in range(scale - 1):
            tdnn(f"blocks.{li}.res2net_block.blocks.{i}", w, w, k)
        tdnn(f"blocks.{li}.tdnn2", channels, channels, 1)
        conv(f"blocks.{li}.se_block.conv1.conv", se, channels, 1)
        conv(f"blocks.{li}.se_block.conv2.conv", channels, se, 1)
    tdnn("mfa", 3 * channels, 3 * channels, 1)
    tdnn("asp.tdnn", attn, 9 * channels, 1)
    conv("asp.conv.conv", 3 * channels, attn, 1)
    bn("asp_bn.norm", 6 * channels)
    conv("fc.conv", emb, 6 * channels, 1)
    return sd


def test_converter_consumes_speechbrain_layout(rng):
    sd = _synthetic_speechbrain_sd(rng)
    params = ecapa.ecapa_params_from_torch_state_dict(sd)
    # converted tree runs and matches the init_ecapa_params structure
    ref = _small_params()
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        ref
    )
    fb = jnp.asarray(rng.standard_normal((2, 50, 80)).astype(np.float32))
    emb = ecapa.embed(params, fb)
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()


def test_embed_shapes_and_mask(rng):
    params = _small_params()
    fb = jnp.asarray(rng.standard_normal((2, 60, 80)).astype(np.float32))
    emb_full = np.asarray(ecapa.embed(params, fb))
    assert emb_full.shape == (2, 16) and np.isfinite(emb_full).all()
    # masked: padding frames beyond each length must not change the output
    lengths = jnp.asarray([60, 40])
    fb_garbage = fb.at[1, 40:].set(1e3)
    a = np.asarray(ecapa.embed(params, fb, lengths))
    b = np.asarray(ecapa.embed(params, fb_garbage, lengths))
    np.testing.assert_allclose(a[1], b[1], rtol=2e-4, atol=2e-4)


def test_fbank_front_end(rng):
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    fb = np.asarray(ecapa.ecapa_fbank(jnp.asarray(tone[None])))
    assert fb.shape == (1, 101, 80)  # 1 s @ 10 ms hop, center-padded
    assert abs(fb.mean()) < 1e-4  # sentence mean-norm
    # energy concentrates at the 440 Hz mel bin
    peak = fb[0].mean(axis=0).argmax()
    centers = ecapa._htk_hz(
        np.linspace(ecapa._htk_mel(0.0), ecapa._htk_mel(8000.0), 82)
    )[1:-1]
    assert abs(centers[peak] - 440.0) < 120.0, centers[peak]


def test_speaker_similarity_native_path(rng):
    from dmel_codec_tpu.eval.external import speaker_similarity

    params = _small_params()
    a = rng.standard_normal(8000).astype(np.float32)
    b = rng.standard_normal(8000).astype(np.float32)
    # identical audio -> cosine 1; independent noise -> strictly less
    same = speaker_similarity(a, a, native_params=params)
    diff = speaker_similarity(a, b, native_params=params)
    assert same == pytest.approx(1.0, abs=1e-5)
    assert diff < same
    # without any weights the gate still raises the actionable error
    with pytest.raises(ImportError):
        speaker_similarity(a, b)


def test_evaluation_harness_full_column_set(rng):
    """Every reference evaluation column executes in one harness run:
    wer_gt/wer_rec, pesq, stoi, spk_sim, si_snr, f0_corr, mel_l1 and
    codebook entropy (reference evaluation.py:113-159)."""
    from dmel_codec_tpu.eval.codecs import DMelCodecAdapter
    from dmel_codec_tpu.eval.evaluation import Evaluation
    from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig

    class StubASR:
        """Stands in for WhisperASR (weights absent here); same interface."""

        def transcribe(self, audios_16k):
            return ["hello world" for _ in audios_16k]

    cfg = DMelCodecConfig(
        encoder_residual_channels=8, encoder_layers=1, decoder_layers=1
    )
    vcfg = BigVGANConfig(upsample_initial_channel=128)
    codec = DMelCodec(config=cfg)
    frames = 8
    codec_params = codec.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, frames, cfg.n_mels)),
        jnp.ones((1, frames, 1)),
        jnp.zeros((1, 1)),
        jnp.zeros((1, frames, cfg.concat_dim)),
    )["params"]
    vparams = BigVGAN(config=vcfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, frames, cfg.n_mels))
    )["params"]
    adapter = DMelCodecAdapter(
        codec_params, cfg, vocoder_params=vparams, vocoder_config=vcfg, seed=0
    )
    ev = Evaluation(
        adapter,
        asr=StubASR(),
        compute_pesq=True,
        spk_params=_small_params(),
    )
    sr = cfg.sample_rate
    t = np.arange(int(0.6 * sr)) / sr
    audios = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 220 * t),
            0.3 * np.sin(2 * np.pi * 330 * t) + 0.05 * np.sin(2 * np.pi * 70 * t),
        ]
    ).astype(np.float32)
    batch = {
        "audios": audios,
        "audio_lengths": np.array([len(t), len(t) // 2], np.int64),
        "texts": ["hello world", "hello there"],
    }
    res = ev.run([batch])
    expected = {
        "wer_gt",
        "wer_rec",
        "pesq",
        "stoi",
        "spk_sim",
        "si_snr",
        "f0_corr",
        "mel_l1",
        "codebook_entropy_mean",
    }
    missing = expected - set(res.means)
    assert not missing, (missing, res.means)
    for k, v in res.means.items():
        assert np.isfinite(v), (k, v)
