"""Log-mel spectrogram front end as pure JAX.

Numerical contract (matches reference dmel_codec/utils/spectrogram.py:41-81):
  * reflect-pad the waveform by (n_fft - hop) // 2 on both sides
  * non-centered STFT with a periodic Hann window
  * magnitude = sqrt(re^2 + im^2 + 1e-9)
  * mel projection with a slaney librosa-style filterbank
  * log(clamp(x, min=1e-5))

TPU-first design notes:
  * Framing uses pure slice/stack when hop divides n_fft (the flagship
    config: 1024/256) — zero gathers, fully fusible by XLA.
  * The DFT can run either as jnp.fft.rfft (exact, matches torch.stft)
    or as a real-valued matmul against a precomputed DFT basis
    (`use_matmul_dft=True`), which maps onto the MXU and is usually
    faster for n_fft=1024 on TPU.
  * Output is channels-last [B, frames, n_mels]; the codec's public API
    transposes to the reference's [B, n_mels, frames] at the boundary.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.dsp.mel import hann_window, mel_filterbank

_LOG_CLIP = 1e-5
_MAG_EPS = 1e-9


def _frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, n_frames, n_fft] with n_frames = 1 + (L - n_fft)//hop."""
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop
    if n_fft % hop == 0:
        # Overlap factor r = n_fft // hop: frame i is the concatenation of
        # hops i..i+r-1. Pure static slices — no gather.
        r = n_fft // hop
        usable = (n_frames - 1) * hop + n_fft
        hops = x[..., :usable]
        n_hops = usable // hop
        hops = hops[..., : n_hops * hop].reshape(*x.shape[:-1], n_hops, hop)
        parts = [hops[..., i : i + n_frames, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return x[..., idx]


@dataclasses.dataclass(frozen=True)
class LogMelSpectrogram:
    """Callable front end. Construct once; apply inside jit.

    Mirrors reference LogMelSpectrogram (utils/spectrogram.py:84-127) with
    sample_rate/n_fft/win_length/hop_length/n_mels/f_min/f_max semantics.
    """

    sample_rate: int = 24000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    n_mels: int = 100
    f_min: float = 0.0
    f_max: float | None = 12000.0
    use_matmul_dft: bool = False

    def __post_init__(self):
        if self.win_length != self.n_fft:
            raise NotImplementedError("win_length != n_fft not needed by any config")

    @property
    def mel_basis(self) -> np.ndarray:
        return mel_filterbank(
            self.sample_rate, self.n_fft, self.n_mels, self.f_min, self.f_max
        )

    @property
    def window(self) -> np.ndarray:
        return hann_window(self.win_length)

    def num_frames(self, num_samples: int) -> int:
        pad = (self.n_fft - self.hop_length) // 2
        return 1 + (num_samples + 2 * pad - self.n_fft) // self.hop_length

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio: [B, L] or [B, 1, L] float -> log-mel [B, frames, n_mels]."""
        return log_mel_spectrogram(
            audio,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            mel_basis=jnp.asarray(self.mel_basis),
            window=jnp.asarray(self.window),
            use_matmul_dft=self.use_matmul_dft,
        )


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "use_matmul_dft"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    mel_basis: jnp.ndarray,
    window: jnp.ndarray,
    use_matmul_dft: bool = False,
) -> jnp.ndarray:
    if audio.ndim == 3:  # [B, 1, L] -> [B, L]
        audio = audio[:, 0, :]
    audio = audio.astype(jnp.float32)

    pad = (n_fft - hop_length) // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")

    frames = _frame_signal(audio, n_fft, hop_length) * window  # [B, F, n_fft]

    if use_matmul_dft:
        # Real DFT as two matmuls onto the MXU: frames @ [cos | -sin] basis.
        n_bins = n_fft // 2 + 1
        k = np.arange(n_bins)[None, :]
        n = np.arange(n_fft)[:, None]
        ang = 2.0 * np.pi * n * k / n_fft
        cos_b = jnp.asarray(np.cos(ang), dtype=jnp.float32)
        sin_b = jnp.asarray(-np.sin(ang), dtype=jnp.float32)
        re = jax.lax.dot_general(
            frames, cos_b, (((2,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )
        im = jax.lax.dot_general(
            frames, sin_b, (((2,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )
        power = re * re + im * im
    else:
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2

    mag = jnp.sqrt(power + _MAG_EPS)  # [B, F, n_bins]
    mel = jax.lax.dot_general(
        mag,
        mel_basis.T.astype(jnp.float32),
        (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, F, n_mels]
    return jnp.log(jnp.clip(mel, min=_LOG_CLIP))
