"""WAV loading, resampling and normalization.

Replaces the reference's librosa.load + peak-normalize step
(dataset/lhotse_tts_dataset.py:26-37: load at cut sr, normalize to
0.95 peak). Two backends with identical semantics:

  * native: one C++ call per cut (native/audio_kernels.cpp — RIFF decode,
    scipy-exact kaiser polyphase resample, peak normalize) that releases
    the GIL end-to-end; the loader's worker threads scale across cores.
  * python: scipy.io.wavfile + scipy.signal.resample_poly fallback, also
    the correctness oracle in tests/test_native_audio.py.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def read_wav(
    path: str, start: float = 0.0, duration: Optional[float] = None
) -> Tuple[np.ndarray, int]:
    """Returns (mono float32 in [-1, 1], sample_rate)."""
    sr, data = wavfile.read(path, mmap=True)
    i0 = int(round(start * sr))
    i1 = len(data) if duration is None else i0 + int(round(duration * sr))
    data = np.asarray(data[i0:i1])
    # scale to [-1, 1] BEFORE downmixing (mean() would change the dtype)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1, dtype=np.float32)
    return data, int(sr)


def resample_audio(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return audio
    g = math.gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g).astype(np.float32)


def peak_normalize(audio: np.ndarray, peak: float = 0.95) -> np.ndarray:
    """Scale so max |x| == peak (reference normalizes every cut to 0.95)."""
    m = np.abs(audio).max()
    if m < 1e-10:
        return audio
    return (audio * (peak / m)).astype(np.float32)


def load_audio_python(
    path: str,
    target_sr: int = 24000,
    start: float = 0.0,
    duration: Optional[float] = None,
    normalize: bool = True,
) -> np.ndarray:
    audio, sr = read_wav(path, start, duration)
    audio = resample_audio(audio, sr, target_sr)
    if normalize:
        audio = peak_normalize(audio)
    return audio


def load_audio_native(
    path: str,
    target_sr: int = 24000,
    start: float = 0.0,
    duration: Optional[float] = None,
    normalize: bool = True,
) -> Optional[np.ndarray]:
    """Decode+resample+normalize in one C++ call (native/audio_kernels.cpp;
    ctypes releases the GIL for the whole call). None if the native library
    is unavailable or reports an error — callers fall back to python."""
    import ctypes

    from dmel_codec_tpu.native import load_library

    lib = load_library()
    if lib is None:
        return None
    p = path.encode()
    dur = -1.0 if duration is None else float(duration)
    n = lib.dmel_load_len(p, float(start), dur, int(target_sr))
    if n < 0:
        return None
    out = np.empty(int(n), np.float32)
    wrote = lib.dmel_load_wav(
        p,
        float(start),
        dur,
        int(target_sr),
        0.95 if normalize else -1.0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(n),
    )
    if wrote < 0:
        return None
    return out[:wrote]


def load_audio(
    path: str,
    target_sr: int = 24000,
    start: float = 0.0,
    duration: Optional[float] = None,
    normalize: bool = True,
    backend: str = "auto",
) -> np.ndarray:
    """backend: 'auto' prefers the native C++ kernel, falling back to the
    numpy/scipy path; 'native' / 'python' force one side."""
    if backend in ("auto", "native"):
        audio = load_audio_native(path, target_sr, start, duration, normalize)
        if audio is not None:
            return audio
        if backend == "native":
            raise RuntimeError("native audio kernels unavailable")
    return load_audio_python(path, target_sr, start, duration, normalize)
