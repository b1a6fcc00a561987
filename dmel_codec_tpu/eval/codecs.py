"""Uniform codec adapter API (the reference's codec zoo, C25).

Parity with reference evaluation/initial_codec.py:7-325: one facade with
encode / decode / rec_audio_from_audio / latent extraction per codec.
'dmel' and 'fishspeech' are native stacks in this framework (DMelCodec and
FireflyArchitecture); the remaining external codecs (DAC, SpeechTokenizer,
Mimi) require packages/weights that do not ship here — their constructors
raise with install hints, keeping the registry shape identical for
downstream harness code.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram
from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig


class DMelCodecAdapter:
    """numpy-in/numpy-out facade over DMelCodec (+ optional BigVGAN)."""

    name = "dmel"

    def __init__(
        self,
        codec_params,
        codec_config: DMelCodecConfig = DMelCodecConfig(),
        vocoder_params=None,
        vocoder_config: Optional[BigVGANConfig] = None,
        seed: int = 0,
        dtype=None,
    ):
        """dtype: jnp.bfloat16 casts all float params/activations for
        serving (the reference's encode_dtype / model_dtype casts)."""
        if dtype is not None:
            import dataclasses as _dc

            codec_config = _dc.replace(
                codec_config, compute_dtype=str(jnp.dtype(dtype))
            )
        self.config = codec_config
        self.codec = DMelCodec(config=codec_config)
        self.dtype = dtype
        if dtype is not None:
            from dmel_codec_tpu.utils.torch_compat import cast_floats

            codec_params = cast_floats(codec_params, dtype)
            if vocoder_params is not None:
                vocoder_params = cast_floats(vocoder_params, dtype)
        self.params = codec_params
        self.mel_tf = LogMelSpectrogram(
            sample_rate=codec_config.sample_rate,
            hop_length=codec_config.hop_length,
            n_mels=codec_config.n_mels,
        )
        self.vocoder = None
        self.vocoder_params = None
        self._vocode = None
        if vocoder_params is not None:
            self.vocoder = BigVGAN(config=vocoder_config or BigVGANConfig())
            self.vocoder_params = vocoder_params
        self._rng = jax.random.PRNGKey(seed)

        # params are jit arguments, not closure constants (constants are
        # serialized into the compiled program)
        self._encode = jax.jit(
            lambda params, mels, lengths: self.codec.apply(
                {"params": params}, mels, lengths, method=DMelCodec.encode
            )
        )
        self._decode_mel = jax.jit(
            lambda params, idx, lengths, noise: self.codec.apply(
                {"params": params}, idx, lengths, noise, method=DMelCodec.decode
            )
        )
        self._latent = jax.jit(
            lambda params, mels, lengths: self.codec.apply(
                {"params": params},
                mels,
                lengths,
                method=DMelCodec.encode_unquantized,
            )[0]
        )

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def _mels(
        self, audio: np.ndarray, audio_lengths=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        mels = self.mel_tf(jnp.asarray(audio))  # mel front end stays f32
        if self.dtype is not None:
            mels = mels.astype(self.dtype)
        f = self.config.downsample_total
        t = (mels.shape[1] // f) * f
        if audio_lengths is None:
            lengths = jnp.full((audio.shape[0],), t, jnp.int32)
        else:
            # per-sample valid frames, floored to the downsample factor so
            # batch zero-padding is never tokenized as audio (the reference
            # slices per-sample, lm_process_input.py:41-46)
            lengths = jnp.asarray(audio_lengths) // self.config.hop_length
            lengths = jnp.minimum((lengths // f) * f, t).astype(jnp.int32)
        return mels[:, :t], lengths

    def encode(
        self, audio: np.ndarray, audio_lengths=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """audio [B, T] (+ per-sample sample counts) ->
        (indices [B, G*R, L], index lengths [B])."""
        mels, lengths = self._mels(audio, audio_lengths)
        idx, idx_len = self._encode(self.params, mels, lengths)
        return np.asarray(idx), np.asarray(idx_len)

    def decode(
        self, indices: np.ndarray, lengths: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """indices -> (audio [B, T] (zeros if no vocoder), mel [B, F, M])."""
        indices = jnp.asarray(indices)
        if lengths is None:
            lengths = jnp.full((indices.shape[0],), indices.shape[2], jnp.int32)
        else:
            lengths = jnp.asarray(lengths)
        t = indices.shape[2] * self.config.downsample_total
        self._rng, k = jax.random.split(self._rng)
        noise = jax.random.normal(
            k,
            (indices.shape[0], t, self.config.concat_dim),
            dtype=self.dtype or jnp.float32,
        )
        mel = self._decode_mel(self.params, indices, lengths, noise)
        if self.vocoder is None:
            return np.zeros((indices.shape[0], 0), np.float32), np.asarray(mel)
        if self._vocode is None:
            self._vocode = jax.jit(
                lambda vp, m: self.vocoder.apply({"params": vp}, m)
            )
        wav = self._vocode(self.vocoder_params, mel)
        return np.asarray(wav, dtype=np.float32), np.asarray(mel)

    def rec_audio_from_audio(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        idx, lengths = self.encode(audio, audio_lengths)
        wav, _ = self.decode(idx, lengths)
        return wav

    def get_latent(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        """Unquantized encoder features [B*G, T, res] (ref latent path)."""
        mels, lengths = self._mels(audio, audio_lengths)
        return np.asarray(self._latent(self.params, mels, lengths))


class FishSpeechAdapter:
    """numpy-in/numpy-out facade over the native FireflyArchitecture codec.

    Mirrors the reference's fish_speech paths in initial_codec.py:
    extract_indices (:107-110), rec_audio_from_indices (:213-215),
    rec_audio_from_audio (:241-246), extract_latent_unquantized (:137-146).
    Runs entirely in this framework — no external fish-speech package.
    """

    name = "fishspeech"

    def __init__(self, params=None, config=None, seed: int = 0, dtype=None):
        """params: flax params (e.g. from firefly_architecture_params_from_torch
        on a fish-speech ckpt). None initializes random weights (API testing).
        """
        from dmel_codec_tpu.models.firefly import (
            FireflyArchitecture,
            FireflyArchitectureConfig,
        )

        self.config = config or FireflyArchitectureConfig()
        self.model = FireflyArchitecture(config=self.config)
        if params is None:
            t = self.config.hop_length * self.config.downsample_total * 2

            def _init_all(mdl, audio, lengths):
                idx, flen = mdl.encode(audio, lengths)
                return mdl.decode(idx, flen)

            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, t), jnp.float32),
                jnp.full((1,), t, jnp.int32),
                method=_init_all,
            )["params"]
        if dtype is not None:
            from dmel_codec_tpu.utils.torch_compat import cast_floats

            params = cast_floats(params, dtype)
        self.params = params
        self.dtype = dtype

        self._encode = jax.jit(
            lambda p, audio, lengths: self.model.apply(
                {"params": p}, audio, lengths, method=FireflyArchitecture.encode
            )
        )
        self._decode = jax.jit(
            lambda p, idx, lengths: self.model.apply(
                {"params": p}, idx, lengths, method=FireflyArchitecture.decode
            )
        )
        self._latent = jax.jit(
            lambda p, audio, lengths: self.model.apply(
                {"params": p},
                audio,
                lengths,
                method=FireflyArchitecture.encode_unquantized,
            )[0]
        )

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def _audio_batch(self, audio, audio_lengths):
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        if audio_lengths is None:
            lengths = np.full((audio.shape[0],), audio.shape[1], np.int32)
        else:
            lengths = np.asarray(audio_lengths, np.int32)
        a = jnp.asarray(audio)
        if self.dtype is not None:
            a = a.astype(self.dtype)
        return a, jnp.asarray(lengths)

    def encode(
        self, audio: np.ndarray, audio_lengths=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """audio [B, T] -> (indices [B, G*R, L], feature lengths [B])."""
        a, lengths = self._audio_batch(audio, audio_lengths)
        idx, flen = self._encode(self.params, a, lengths)
        return np.asarray(idx), np.asarray(flen)

    def decode(
        self, indices: np.ndarray, lengths: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """indices -> (audio [B, T], None) — fish path emits no gen_mel
        (initial_codec.py:198, gen_mel stays None off the dMel branch)."""
        indices = jnp.asarray(indices)
        if lengths is None:
            lengths = jnp.full((indices.shape[0],), indices.shape[2], jnp.int32)
        else:
            lengths = jnp.asarray(lengths)
        wav, _audio_lengths = self._decode(self.params, indices, lengths)
        return np.asarray(wav, dtype=np.float32), None

    def rec_audio_from_audio(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        idx, flen = self.encode(audio, audio_lengths)
        wav, _ = self.decode(idx, flen)
        return wav

    def get_latent(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        """Unquantized backbone features [B, F, D] (ref :137-146)."""
        a, lengths = self._audio_batch(audio, audio_lengths)
        return np.asarray(self._latent(self.params, a, lengths))


def _unavailable(name: str, hint: str) -> Callable:
    def ctor(*_args, **_kwargs):
        raise ImportError(
            f"codec '{name}' needs external packages/weights not present in "
            f"this environment: {hint}"
        )

    return ctor


CODEC_REGISTRY: Dict[str, Callable] = {
    "dmel": DMelCodecAdapter,
    "dac": _unavailable("dac", "pip install descript-audio-codec + weights"),
    "speechtokenizer": _unavailable(
        "speechtokenizer", "pip install speechtokenizer + weights"
    ),
    "mimi": _unavailable("mimi", "HF transformers MimiModel weights"),
    "fishspeech": FishSpeechAdapter,
}


def make_codec(name: str, *args, **kwargs):
    if name not in CODEC_REGISTRY:
        raise KeyError(f"unknown codec '{name}'; have {sorted(CODEC_REGISTRY)}")
    return CODEC_REGISTRY[name](*args, **kwargs)
