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


def test_registry_gates_external_codecs():
    with pytest.raises(ImportError, match="dac"):
        make_codec("dac")
    with pytest.raises(KeyError):
        make_codec("nope")


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
