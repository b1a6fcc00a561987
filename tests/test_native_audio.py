"""Native C++ audio kernels vs the python/scipy oracle.

The contract (data/audio.py docstring): the native path must reproduce the
python path — RIFF decode for every supported sample format, the
scipy.signal.resample_poly kaiser polyphase, slicing, and 0.95-peak
normalization — within float rounding.
"""

import numpy as np
import pytest
from scipy.io import wavfile

from dmel_codec_tpu.data.audio import (
    load_audio,
    load_audio_native,
    load_audio_python,
)
from dmel_codec_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain to build native kernels"
)


def _write_wav(path, sr, data):
    wavfile.write(str(path), sr, data)
    return str(path)


@pytest.mark.parametrize(
    "dtype,scale",
    [
        (np.int16, 32767),
        (np.int32, 2**31 - 1),
        (np.float32, 1.0),
        (np.uint8, None),
    ],
)
def test_decode_formats_match_python(rng, tmp_path, dtype, scale):
    x = rng.standard_normal(5000).astype(np.float64) * 0.5
    if dtype == np.uint8:
        data = np.clip(x * 127 + 128, 0, 255).astype(np.uint8)
    elif np.issubdtype(dtype, np.integer):
        data = np.clip(x * scale, -scale, scale).astype(dtype)
    else:
        data = x.astype(dtype)
    path = _write_wav(tmp_path / "a.wav", 24000, data)
    a = load_audio_native(path, target_sr=24000)
    b = load_audio_python(path, target_sr=24000)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_stereo_downmix_matches_python(rng, tmp_path):
    data = (rng.standard_normal((4000, 2)) * 12000).astype(np.int16)
    path = _write_wav(tmp_path / "st.wav", 24000, data)
    a = load_audio_native(path, target_sr=24000)
    b = load_audio_python(path, target_sr=24000)
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("src_sr", [16000, 22050, 44100, 48000, 8000])
def test_resample_matches_scipy(rng, tmp_path, src_sr):
    """The C++ polyphase must agree with scipy.signal.resample_poly —
    same firwin taps, same alignment — across common rate pairs."""
    dur = 1.3
    data = (rng.standard_normal(int(src_sr * dur)) * 20000).astype(np.int16)
    path = _write_wav(tmp_path / f"r{src_sr}.wav", src_sr, data)
    a = load_audio_native(path, target_sr=24000, normalize=False)
    b = load_audio_python(path, target_sr=24000, normalize=False)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_slice_and_normalize_match_python(rng, tmp_path):
    data = (rng.standard_normal(44100 * 2) * 15000).astype(np.int16)
    path = _write_wav(tmp_path / "s.wav", 44100, data)
    a = load_audio_native(path, target_sr=24000, start=0.37, duration=0.81)
    b = load_audio_python(path, target_sr=24000, start=0.37, duration=0.81)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-5)
    assert abs(np.abs(a).max() - 0.95) < 1e-3  # peak-normalized


def test_auto_backend_prefers_native(rng, tmp_path):
    data = (rng.standard_normal(2400) * 9000).astype(np.int16)
    path = _write_wav(tmp_path / "p.wav", 24000, data)
    a = load_audio(path, backend="auto")
    n = load_audio(path, backend="native")
    np.testing.assert_array_equal(a, n)


def test_wav_info(rng, tmp_path):
    import ctypes

    from dmel_codec_tpu.native import load_library

    lib = load_library()
    data = (rng.standard_normal((1234, 2)) * 9000).astype(np.int16)
    path = _write_wav(tmp_path / "i.wav", 22050, data)
    sr, n, ch = ctypes.c_int(), ctypes.c_long(), ctypes.c_int()
    assert lib.dmel_wav_info(path.encode(), sr, n, ch) == 0
    assert (sr.value, n.value, ch.value) == (22050, 1234, 2)
