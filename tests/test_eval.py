"""Evaluation layer: native metrics sanity + harness end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmel_codec_tpu.eval.codecs import DMelCodecAdapter, make_codec
from dmel_codec_tpu.eval.evaluation import Evaluation
from dmel_codec_tpu.eval.metrics import (
    clean_text,
    codebook_usage_entropy,
    f0_corr,
    mel_l1_distance,
    si_snr,
    stoi,
    wer,
)
from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig

SR = 24000


def _speechlike(rng, seconds=1.5):
    """Amplitude-modulated harmonic tone — enough structure for STOI/F0."""
    t = np.arange(int(SR * seconds)) / SR
    f0 = 160 + 40 * np.sin(2 * np.pi * 2.0 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    x = sum(np.sin(k * phase) / k for k in range(1, 5))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    return (x * env * 0.3).astype(np.float32)


def test_wer_and_cleaning():
    assert wer(["hello world"], ["hello world"]) == 0.0
    assert wer(["hello world"], ["hello there"]) == 0.5
    assert wer(["Hello, WORLD!"], ["hello world"]) == 0.0
    assert clean_text("A,b.C!") == "a b c"
    assert wer(["a b c d"], [""]) == 1.0


def test_si_snr_behaviour(rng):
    x = rng.standard_normal(8000).astype(np.float32)
    assert si_snr(x, x) > 60
    assert si_snr(x, 3.0 * x) > 60  # scale-invariant
    noisy = x + 0.1 * rng.standard_normal(8000).astype(np.float32)
    mid = si_snr(x, noisy)
    assert 10 < mid < 30
    assert si_snr(x, rng.standard_normal(8000)) < 5


def test_stoi_behaviour(rng):
    x = _speechlike(rng)
    clean = stoi(x, x, SR)
    assert clean > 0.95
    noisy = stoi(x, x + 0.05 * rng.standard_normal(len(x)).astype(np.float32), SR)
    very_noisy = stoi(x, x + 0.5 * rng.standard_normal(len(x)).astype(np.float32), SR)
    assert clean >= noisy >= very_noisy
    assert very_noisy < 0.9


def test_f0_corr_behaviour(rng):
    x = _speechlike(rng)
    assert f0_corr(x, x, SR) > 0.99
    # pitch-shifted signal should correlate worse than identity
    t = np.arange(len(x)) / SR
    other = np.sin(2 * np.pi * (300 + 100 * np.cos(2 * np.pi * 1.3 * t)) * t)
    c = f0_corr(x, other.astype(np.float32), SR)
    assert not np.isfinite(c) or c < 0.9


def test_mel_l1_distance(rng):
    x = _speechlike(rng)
    assert mel_l1_distance(x, x, SR) == 0.0
    assert mel_l1_distance(x, np.zeros_like(x), SR) > 1.0


def test_codebook_entropy():
    # uniform codes -> ~log2(size) bits; constant codes -> 0 bits
    uniform = np.arange(175 * 4).reshape(1, 1, -1) % 175
    e_uniform = codebook_usage_entropy(uniform, 175)[0]
    np.testing.assert_allclose(e_uniform, np.log2(175), atol=1e-6)
    const = np.zeros((2, 3, 50), np.int64)
    np.testing.assert_allclose(
        codebook_usage_entropy(const, 175), 0.0, atol=1e-6
    )  # 1e-10 clamp leaves ~6e-8 bits (reference clamps identically)


def test_registry_complete():
    """Every codec in the reference's zoo (initial_codec.py:6) constructs
    for real — none are gated stubs anymore."""
    from dmel_codec_tpu.eval.codecs import CODEC_REGISTRY

    assert set(CODEC_REGISTRY) == {
        "dmel", "dac", "speechtokenizer", "mimi", "fishspeech", "encodec",
    }
    with pytest.raises(KeyError):
        make_codec("nope")


def test_speechtokenizer_adapter_roundtrip(rng):
    """Native JAX SpeechTokenizer adapter: uniform surface round-trip on a
    tiny config (random weights; architecture golden-tested vs HF Encodec
    in test_seanet.py)."""
    from dmel_codec_tpu.models.seanet import SEANetConfig

    cfg = SEANetConfig(
        n_filters=4,
        dimension=16,
        ratios=(4, 2),
        lstm_layers=1,
        n_q=4,
        codebook_size=32,
        semantic_dimension=8,
    )
    codec = make_codec("speechtokenizer", config=cfg, num_quantizers=3)
    hop = cfg.hop_length
    t = hop * 10
    x = (rng.standard_normal((2, t)) * 0.3).astype(np.float32)
    idx, lens = codec.encode(x, np.array([t, t // 2]))
    assert idx.shape == (2, 3, 10)
    assert int(lens[1]) == 5
    wav, _ = codec.decode(idx)
    assert wav.shape == (2, t)
    rec = codec.rec_audio_from_audio(x)
    assert rec.shape == (2, t)
    z = codec.get_latent(x)
    assert z.shape == (2, 10, 16)
    q = codec.get_latent_quantized(x)
    assert q.shape == (2, 10, 16)


def test_encodec_adapter_roundtrip(rng):
    """The bonus native EnCodec entry (causal flavour) round-trips."""
    from dmel_codec_tpu.models.seanet import SEANetConfig

    cfg = SEANetConfig.encodec_24k(
        n_filters=4, dimension=16, ratios=(4, 2), lstm_layers=1,
        n_q=4, codebook_size=32,
    )
    codec = make_codec("encodec", config=cfg)
    assert codec.sample_rate == 24000
    t = cfg.hop_length * 8
    x = (rng.standard_normal((1, t)) * 0.3).astype(np.float32)
    rec = codec.rec_audio_from_audio(x)
    assert rec.shape == (1, t)


def test_dac_adapter_roundtrip(rng):
    """Real DAC adapter on a tiny random-init transformers DacModel:
    the full reference surface (initial_codec.py:104-105,126-127,204-206,
    234-235) must round-trip with consistent shapes."""
    from transformers import DacConfig

    cfg = DacConfig(
        encoder_hidden_size=8,
        downsampling_ratios=[2, 4],
        decoder_hidden_size=8,
        n_codebooks=3,
        codebook_size=32,
        codebook_dim=4,
        sampling_rate=16000,
    )
    codec = make_codec("dac", config=cfg, num_quantizers=2)
    hop = 8  # prod(ratios)
    t = hop * 20
    x = np.stack(
        [rng.standard_normal(t), rng.standard_normal(t) * 0.5]
    ).astype(np.float32) * 0.3
    idx, lens = codec.encode(x, np.array([t, t // 2]))
    assert idx.shape[:2] == (2, 2)  # n_quantizers cap honored
    assert int(lens[1]) == (t // 2 + hop - 1) // hop
    wav, _ = codec.decode(idx)
    assert wav.shape[0] == 2 and wav.shape[1] >= t - hop
    rec = codec.rec_audio_from_audio(x)
    assert rec.shape[0] == 2
    z = codec.get_latent(x)
    assert z.shape[0] == 2 and z.shape[2] == t // hop


def test_mimi_adapter_roundtrip(rng):
    """Real Mimi adapter on a tiny random-init transformers MimiModel
    (the reference's own backend, initial_codec.py:46-52)."""
    from transformers import MimiConfig

    cfg = MimiConfig(
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        intermediate_size=32,
        num_filters=4,
        num_residual_layers=1,
        upsampling_ratios=[4, 2],
        codebook_size=32,
        codebook_dim=8,
        vector_quantization_hidden_dimension=8,
        num_quantizers=4,
        num_semantic_quantizers=1,
        sliding_window=4,
        upsample_groups=16,
    )
    codec = make_codec("mimi", config=cfg, num_quantizers=3)
    hop = codec.hop_length
    t = hop * 6
    x = (rng.standard_normal((2, t)) * 0.3).astype(np.float32)
    idx, lens = codec.encode(x, np.array([t, t // 2]))
    assert idx.shape[0] == 2 and idx.shape[1] == 3
    assert int(lens[0]) == idx.shape[2]
    wav, _ = codec.decode(idx, lens)
    assert wav.shape[0] == 2 and wav.shape[1] == idx.shape[2] * hop
    rec = codec.rec_audio_from_audio(x, np.array([t, t]))
    assert rec.shape == x.shape
    z = codec.get_latent(x)
    assert z.shape[0] == 2


@pytest.fixture(scope="module")
def adapter():
    cfg = DMelCodecConfig(
        encoder_residual_channels=12, encoder_layers=2, decoder_layers=2
    )
    model = DMelCodec(config=cfg)
    t = 16
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, t, cfg.n_mels)),
        jnp.ones((1, t, 1)),
        jnp.zeros((1, 1)),
        jnp.zeros((1, t, cfg.concat_dim)),
    )["params"]
    return DMelCodecAdapter(params, cfg)


def test_evaluation_harness_runs(rng, adapter):
    x = np.stack([_speechlike(rng), _speechlike(rng) * 0.5])
    batch = {
        "audios": x,
        "audio_lengths": np.array([x.shape[1], x.shape[1] // 2]),
        "texts": ["a", "b"],
    }
    result = Evaluation(adapter).run([batch])
    assert "codebook_entropy_mean" in result.means
    assert "mel_l1" in result.means and np.isfinite(result.means["mel_l1"])
    # no vocoder -> waveform metrics absent, mel-domain fallback used
    assert "si_snr" not in result.means

    # adapter API surface (reference initial_codec parity)
    idx, lengths = adapter.encode(x)
    assert idx.shape[1] == adapter.config.num_codebook_rows
    latent = adapter.get_latent(x)
    assert latent.shape[0] == x.shape[0] * adapter.config.dmel_groups
    rec = adapter.rec_audio_from_audio(x)
    assert rec.shape[0] == x.shape[0]  # no vocoder -> empty time axis ok


def test_adapter_respects_audio_lengths(rng, adapter):
    """Padded tail must not change the valid region's tokens."""
    n = 256 * 16
    a = rng.standard_normal(n).astype(np.float32) * 0.3
    full = np.zeros((1, 2 * n), np.float32)
    full[0, :n] = a
    idx_padded, len_padded = adapter.encode(full, np.array([n]))
    idx_exact, len_exact = adapter.encode(a[None, :], np.array([n]))
    assert int(len_padded[0]) == int(len_exact[0])
    L = int(len_exact[0])
    np.testing.assert_array_equal(idx_padded[0, :, :L], idx_exact[0, :, :L])


@pytest.fixture(scope="module")
def fish_adapter():
    """Tiny FireflyArchitecture so the round-trip runs fast (random weights,
    per VERDICT r1 Next #3 — adapter API + encode->decode round trip)."""
    from dmel_codec_tpu.models.firefly import (
        ConvNeXtEncoderConfig,
        FireflyArchitectureConfig,
        HiFiGANConfig,
    )

    cfg = FireflyArchitectureConfig(
        sample_rate=1024,
        n_fft=64,
        hop_length=16,
        n_mels=20,
        backbone=ConvNeXtEncoderConfig(
            input_channels=20, depths=(1, 1), dims=(16, 24)
        ),
        head=HiFiGANConfig(
            hop_length=16,
            upsample_rates=(4, 2, 2),
            upsample_kernel_sizes=(8, 4, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            num_mels=24,
            upsample_initial_channel=16,
            use_template=False,
            pre_conv_kernel_size=7,
            post_conv_kernel_size=7,
        ),
        fsq_input_dim=24,
        fsq_groups=4,
        fsq_codebooks=1,
        fsq_levels=(7, 5, 5),
        fsq_downsample=(2, 2),
    )
    return make_codec("fishspeech", config=cfg)


def test_fishspeech_adapter_roundtrip(rng, fish_adapter):
    a = fish_adapter
    cfg = a.config
    sr = cfg.sample_rate
    audio = rng.standard_normal((2, 2 * sr)).astype(np.float32) * 0.3
    lengths = np.asarray([2 * sr, sr], np.int32)

    idx, flen = a.encode(audio, lengths)
    g, r = cfg.fsq_groups, cfg.fsq_codebooks
    assert idx.shape[0] == 2 and idx.shape[1] == g * r
    # feature rate = mel frames / prod(downsample): sample i half as long
    assert int(flen[1]) == int(flen[0]) // 2
    assert idx.max() < int(np.prod(cfg.fsq_levels))

    wav, gen_mel = a.decode(idx, flen)
    assert gen_mel is None  # fish path emits no mel (initial_codec.py:198)
    expected_t = idx.shape[2] * cfg.downsample_total * cfg.hop_length
    assert wav.shape == (2, expected_t)
    assert np.isfinite(wav).all()
    # decode masks audio past feature_lengths*factor*hop (fish semantics)
    valid1 = int(flen[1]) * cfg.downsample_total * cfg.hop_length
    assert np.abs(wav[1, valid1:]).max() == 0.0

    rec = a.rec_audio_from_audio(audio, lengths)
    assert rec.shape == wav.shape

    latents = a.get_latent(audio, lengths)
    assert latents.shape[0] == 2 and latents.shape[2] == cfg.fsq_input_dim


def test_fishspeech_converter_matches_torch_layout(rng, fish_adapter):
    """firefly_architecture_params_from_torch produces the exact flax tree."""
    from dmel_codec_tpu.models.firefly import firefly_architecture_params_from_torch

    cfg = fish_adapter.config
    flax_params = fish_adapter.params

    # synthesize a torch-layout state dict with the right shapes by walking
    # the flax tree backwards for the quantizer projections, then verify the
    # converter reproduces identical arrays
    rvqs = flax_params["quantizer"]["residual_fsq"]["rvqs"]
    sd = {}
    for gidx in range(cfg.fsq_groups):
        gp = f"quantizer.residual_fsq.rvqs.{gidx}."
        sd[f"{gp}project_in.weight"] = np.asarray(
            rvqs["project_in"]["kernel"][gidx]
        ).T
        sd[f"{gp}project_in.bias"] = np.asarray(rvqs["project_in"]["bias"][gidx])
        sd[f"{gp}project_out.weight"] = np.asarray(
            rvqs["project_out"]["kernel"][gidx]
        ).T
        sd[f"{gp}project_out.bias"] = np.asarray(rvqs["project_out"]["bias"][gidx])

    from dmel_codec_tpu.models.codec_convert import downsample_fsq_params_from_torch

    got = downsample_fsq_params_from_torch(
        sd, "quantizer.", 0, cfg.fsq_groups
    )["residual_fsq"]["rvqs"]
    np.testing.assert_array_equal(
        got["project_in"]["kernel"], np.asarray(rvqs["project_in"]["kernel"])
    )
    np.testing.assert_array_equal(
        got["project_out"]["kernel"], np.asarray(rvqs["project_out"]["kernel"])
    )


# ---------------------------------------------------------------------------
# STOI anchor (VERDICT r1 Next #9): pystoi cannot be installed here, so the
# oracle below is an independent line-by-line numpy transcription of
# pystoi.stoi (Taal et al. 2011; thirdoct's exact snap-to-bin band edges,
# silent-frame removal with overlap-add, 30-frame segments, -15 dB clip).
# Our eval.metrics.stoi must agree within +-0.03 on tone+noise mixtures.
# ---------------------------------------------------------------------------


def _pystoi_oracle(x, y, fs_sig):
    from scipy.signal import resample_poly
    import math

    FS, N_FRAME, NFFT, NUMBAND, MINFREQ = 10000, 256, 512, 15, 150.0
    N, BETA, DYN_RANGE = 30, -15.0, 40.0
    if fs_sig != FS:
        g = math.gcd(fs_sig, FS)
        x = resample_poly(x, FS // g, fs_sig // g)
        y = resample_poly(y, FS // g, fs_sig // g)

    # remove_silent_frames (pystoi utils): frame range excludes the tail
    w = np.hanning(N_FRAME + 2)[1:-1]
    frames = range(0, len(x) - N_FRAME, N_FRAME // 2)
    x_frames = np.array([w * x[i : i + N_FRAME] for i in frames])
    y_frames = np.array([w * y[i : i + N_FRAME] for i in frames])
    x_energies = 20 * np.log10(np.linalg.norm(x_frames, axis=1) + 1e-16)
    mask = (np.max(x_energies) - DYN_RANGE - x_energies) < 0
    x_frames, y_frames = x_frames[mask], y_frames[mask]
    n = len(x_frames)
    x_sil = np.zeros((n - 1) * (N_FRAME // 2) + N_FRAME)
    y_sil = np.zeros_like(x_sil)
    for i in range(n):
        o = i * (N_FRAME // 2)
        x_sil[o : o + N_FRAME] += x_frames[i]
        y_sil[o : o + N_FRAME] += y_frames[i]

    # stft
    frames2 = range(0, len(x_sil) - N_FRAME, N_FRAME // 2)
    X = np.abs(
        np.fft.rfft([w * x_sil[i : i + N_FRAME] for i in frames2], NFFT)
    ) ** 2
    Y = np.abs(
        np.fft.rfft([w * y_sil[i : i + N_FRAME] for i in frames2], NFFT)
    ) ** 2

    # thirdoct
    f = np.linspace(0, FS, NFFT + 1)[: NFFT // 2 + 1]
    k = np.arange(NUMBAND, dtype=float)
    freq_low = MINFREQ * 2.0 ** ((2 * k - 1) / 6)
    freq_high = MINFREQ * 2.0 ** ((2 * k + 1) / 6)
    obm = np.zeros((NUMBAND, len(f)))
    for i in range(NUMBAND):
        fl = np.argmin(np.square(f - freq_low[i]))
        fh = np.argmin(np.square(f - freq_high[i]))
        obm[i, fl:fh] = 1

    Xb = np.sqrt(X @ obm.T)
    Yb = np.sqrt(Y @ obm.T)
    if Xb.shape[0] < N:
        return float("nan")
    c = 10 ** (-BETA / 20.0)
    d = 0.0
    for m in range(N, Xb.shape[0] + 1):
        xs = Xb[m - N : m].T
        ys = Yb[m - N : m].T
        alpha = np.sqrt(
            np.sum(xs**2, axis=1, keepdims=True)
            / (np.sum(ys**2, axis=1, keepdims=True) + 1e-16)
        )
        ay = ys * alpha
        ayp = np.minimum(ay, xs * (1 + c))
        xn = xs - xs.mean(1, keepdims=True)
        yn = ayp - ayp.mean(1, keepdims=True)
        xn /= np.linalg.norm(xn, axis=1, keepdims=True) + 1e-16
        yn /= np.linalg.norm(yn, axis=1, keepdims=True) + 1e-16
        d += float(np.sum(xn * yn))
    return d / (NUMBAND * (Xb.shape[0] - N + 1))


def test_stoi_matches_pystoi_oracle(rng):
    sr = 10000
    t = np.arange(3 * sr) / sr
    clean = (
        np.sin(2 * np.pi * 440 * t) * (1 + 0.4 * np.sin(2 * np.pi * 4 * t))
        + 0.5 * np.sin(2 * np.pi * 880 * t + 0.5)
    ).astype(np.float64)
    for snr_db in (10.0, 0.0, -5.0):
        noise = rng.standard_normal(len(t))
        noise *= np.linalg.norm(clean) / np.linalg.norm(noise) / 10 ** (snr_db / 20)
        noisy = clean + noise
        ours = stoi(clean, noisy, sample_rate=sr)
        gold = _pystoi_oracle(clean, noisy, sr)
        assert abs(ours - gold) <= 0.03, (snr_db, ours, gold)

    # 24 kHz input exercises the resample leg
    sr2 = 24000
    t2 = np.arange(3 * sr2) / sr2
    clean2 = np.sin(2 * np.pi * 300 * t2) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t2))
    noise2 = rng.standard_normal(len(t2))
    noise2 *= np.linalg.norm(clean2) / np.linalg.norm(noise2)  # 0 dB
    ours2 = stoi(clean2, clean2 + noise2, sample_rate=sr2)
    gold2 = _pystoi_oracle(clean2, clean2 + noise2, sr2)
    assert abs(ours2 - gold2) <= 0.03, (ours2, gold2)


def test_stoi_absolute_anchors(rng):
    """Identity ~1; intelligibility decreases with noise."""
    sr = 10000
    t = np.arange(2 * sr) / sr
    clean = np.sin(2 * np.pi * 500 * t) * (1 + 0.5 * np.sin(2 * np.pi * 5 * t))
    assert stoi(clean, clean, sample_rate=sr) > 0.99
    scores = []
    for snr_db in (15.0, 0.0, -10.0):
        noise = rng.standard_normal(len(t))
        noise *= np.linalg.norm(clean) / np.linalg.norm(noise) / 10 ** (snr_db / 20)
        scores.append(stoi(clean, clean + noise, sample_rate=sr))
    assert scores[0] > scores[1] > scores[2]
