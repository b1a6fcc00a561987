"""Native P.862-structure PESQ: pinned max score, invariances, monotonicity.

The ITU conformance corpus and the `pesq` package are unavailable in this
environment (zero egress), so these tests pin the properties the metric
must have to be usable as a codec-quality signal: the exact P.862.2
ceiling on identical inputs, invariance to level and small delays (the
alignment front end), and strict monotone degradation under additive
noise and bandwidth loss. See the honesty note in eval/pesq_native.py.
"""

import numpy as np
import pytest

from dmel_codec_tpu.eval.pesq_native import pesq_wb, pesq_wb_raw

FS = 16000


def _speechish(seconds=3.0, seed=0):
    """Speech-like test signal: harmonic tone bursts with a pitch contour
    plus a weak fricative-ish noise band, amplitude-modulated at a
    syllabic rate."""
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    t = np.arange(n) / FS
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    voiced = sum(np.sin(k * phase) / k for k in range(1, 8))
    noise = rng.standard_normal(n) * 0.05
    syllable = 0.5 * (1 + np.sign(np.sin(2 * np.pi * 2.5 * t + 0.3)))
    env = 0.2 + 0.8 * syllable
    return ((voiced + noise) * env * 0.1).astype(np.float64)


def _snr_mix(x, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(x))
    noise *= np.sqrt((x**2).mean() / (noise**2).mean() / 10 ** (snr_db / 10))
    return x + noise


def test_identical_signals_hit_the_p862_2_ceiling():
    x = _speechish()
    raw = pesq_wb_raw(x, x)
    assert raw == pytest.approx(4.5, abs=1e-9)
    # 0.999 + 4/(1+exp(-1.3669*4.5+3.8224)) = 4.6439...
    assert pesq_wb(x, x) == pytest.approx(4.6439, abs=1e-3)


def test_level_invariance():
    """The level-alignment front end must cancel a pure gain change."""
    x = _speechish()
    assert pesq_wb(x, 0.25 * x) == pytest.approx(pesq_wb(x, x), abs=0.02)
    assert pesq_wb(x, 3.0 * x) == pytest.approx(pesq_wb(x, x), abs=0.02)


def test_small_delay_absorbed_by_alignment():
    x = _speechish(3.0)
    delayed = np.concatenate([np.zeros(1600), x])  # +100 ms
    aligned_score = pesq_wb(x, delayed)
    assert aligned_score > 4.0, aligned_score


def test_noise_monotonicity():
    x = _speechish()
    scores = [pesq_wb(x, _snr_mix(x, snr)) for snr in (40, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.5, scores  # 40 dB SNR is nearly transparent
    assert scores[-1] < 2.5, scores  # 0 dB SNR is clearly bad


def test_bandwidth_monotonicity():
    """Progressive low-pass (bandwidth loss) must lower the score."""
    from scipy.signal import butter, sosfilt

    x = _speechish()
    scores = []
    for cutoff in (7000, 3000, 1000):
        sos = butter(6, cutoff / (FS / 2), output="sos")
        scores.append(pesq_wb(x, sosfilt(sos, x)))
    assert pesq_wb(x, x) > scores[0] > scores[1] > scores[2], scores


def test_in_range():
    x = _speechish()
    rng = np.random.default_rng(7)
    garbage = rng.standard_normal(len(x))
    s = pesq_wb(x, garbage)
    assert 1.0 <= s <= 4.65, s


def test_harness_column_without_external_packages():
    """Evaluation.step emits a pesq column with zero external deps
    (VERDICT r2 Missing #1): pesq_wb_16k falls back to the native path."""
    from dmel_codec_tpu.eval.external import pesq_wb_16k

    x = _speechish(1.5)
    assert pesq_wb_16k(x, x) == pytest.approx(4.6439, abs=1e-3)
