"""Front-end parity: log-mel vs torch.stft-based reference math.

The torch golden below re-states the reference pipeline
(dmel_codec/utils/spectrogram.py:41-81) operation by operation — reflect pad,
non-centered STFT with periodic Hann, sqrt(power + 1e-9), mel matmul,
log(clamp(1e-5)) — so the JAX implementation is checked end to end.
"""

import numpy as np
import pytest
import torch

from dmel_codec_tpu.dsp import LogMelSpectrogram, hann_window, mel_filterbank

SR, NFFT, HOP, NMELS, FMAX = 24000, 1024, 256, 100, 12000.0


def torch_logmel(audio: np.ndarray, mel_basis: np.ndarray) -> np.ndarray:
    y = torch.from_numpy(audio).float()
    pad = (NFFT - HOP) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y,
        NFFT,
        hop_length=HOP,
        win_length=NFFT,
        window=torch.hann_window(NFFT),
        center=False,
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    mel = torch.matmul(torch.from_numpy(mel_basis).float(), mag)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


def test_hann_window_matches_torch():
    ours = hann_window(NFFT)
    theirs = torch.hann_window(NFFT).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mel_filterbank_analytic_properties():
    fb = mel_filterbank(SR, NFFT, NMELS, 0.0, FMAX)
    assert fb.shape == (NMELS, NFFT // 2 + 1)
    # Every filter is a normalized triangle: non-negative, single-peaked,
    # and zero above f_max's bin.
    assert (fb >= 0).all()
    fmax_bin = int(np.ceil(FMAX / (SR / 2) * (NFFT // 2)))
    assert fb[:, fmax_bin + 2 :].sum() == 0.0
    # Slaney area-norm makes each triangle integrate to 1 in Hz, so its
    # discrete sum ≈ 1/df once the triangle spans many bins (high filters).
    df = SR / NFFT
    np.testing.assert_allclose(fb[80].sum(), 1.0 / df, rtol=0.05)


def test_logmel_matches_torch_reference(rng):
    audio = rng.standard_normal((2, SR)).astype(np.float32) * 0.3
    fe = LogMelSpectrogram(SR, NFFT, NFFT, HOP, NMELS, 0.0, FMAX)
    ours = np.asarray(fe(audio))  # [B, F, M]
    golden = torch_logmel(audio, fe.mel_basis)  # [B, M, F]
    assert ours.shape == (2, golden.shape[2], NMELS)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=2e-4, rtol=1e-4)


def test_logmel_matmul_dft_close_to_fft(rng):
    audio = rng.standard_normal((1, 24000)).astype(np.float32) * 0.3
    fft_fe = LogMelSpectrogram(SR, NFFT, NFFT, HOP, NMELS, 0.0, FMAX)
    mm_fe = LogMelSpectrogram(SR, NFFT, NFFT, HOP, NMELS, 0.0, FMAX, use_matmul_dft=True)
    a = np.asarray(fft_fe(audio))
    b = np.asarray(mm_fe(audio))
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_num_frames():
    fe = LogMelSpectrogram(SR, NFFT, NFFT, HOP, NMELS, 0.0, FMAX)
    audio = np.zeros((1, SR), np.float32)
    assert np.asarray(fe(audio)).shape[1] == fe.num_frames(SR)


def test_sine_peak_bin():
    """A pure tone must put its energy in the right mel band."""
    t = np.arange(SR) / SR
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    fe = LogMelSpectrogram(SR, NFFT, NFFT, HOP, NMELS, 0.0, FMAX)
    mel = np.asarray(fe(tone))[0].mean(0)  # [M]
    from dmel_codec_tpu.dsp.mel import mel_frequencies

    centers = mel_frequencies(NMELS + 2, 0.0, FMAX)[1:-1]
    peak_hz = centers[int(mel.argmax())]
    assert abs(peak_hz - 1000.0) < 100.0
