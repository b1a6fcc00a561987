"""Uniform codec adapter API (the reference's codec zoo, C25).

Parity with reference evaluation/initial_codec.py:7-325: one facade with
encode / decode / rec_audio_from_audio / latent extraction per codec.
'dmel', 'fishspeech', 'speechtokenizer' and 'encodec' are native JAX
stacks in this framework (DMelCodec, FireflyArchitecture, and the
SEANet+RVQ family in models/seanet.py); 'dac' and 'mimi' wrap HF
transformers' DacModel / MimiModel on host CPU (the reference's own Mimi
backend, initial_codec.py:46-52; DacModel carries the same descript
weights as the `dac` package the reference imports). 'encodec' is listed
in the reference's zoo docstring (initial_codec.py:6) but implemented only
here.
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


class DacCodecAdapter:
    """numpy-in/numpy-out facade over a Descript-audio-codec model.

    The reference wraps the `dac` package (initial_codec.py:33-36); that
    package does not ship here, but HF transformers' `DacModel` is the same
    architecture/weights (descript/dac_Nkhz on the hub), so this adapter
    gives the identical surface: encode (:104-105 `codec.encode -> codes`),
    rec from indices via `quantizer.from_codes` + decode (:204-206),
    rec_audio_from_audio via forward (:234-235), unquantized latent via
    `codec.encoder` (:126-127). Runs torch on host CPU — these zoo codecs
    exist for metric comparison, not the TPU serving path.
    """

    name = "dac"

    def __init__(
        self,
        model_path: Optional[str] = None,
        config=None,
        num_quantizers: Optional[int] = None,
        device: str = "cpu",
    ):
        """model_path: local HF checkpoint dir (zero-egress: no hub pulls).
        config: a transformers.DacConfig for random-init (API tests)."""
        try:
            import torch
            from transformers import DacConfig, DacModel
        except ImportError as e:  # pragma: no cover
            raise ImportError("codec 'dac' needs transformers+torch") from e
        self._torch = torch
        if model_path is not None:
            self.model = DacModel.from_pretrained(model_path)
        else:
            self.model = DacModel(config or DacConfig())
        self.model.to(device).eval()
        self.config = self.model.config
        self.num_quantizers = num_quantizers
        self.device = device
        self.hop_length = int(np.prod(self.config.downsampling_ratios))

    @property
    def sample_rate(self) -> int:
        return int(self.config.sampling_rate)

    def _batch(self, audio: np.ndarray):
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        return self._torch.from_numpy(audio[:, None, :]).to(self.device)

    def _code_lengths(self, audio_lengths, batch: int, frames: int) -> np.ndarray:
        if audio_lengths is None:
            return np.full((batch,), frames, np.int32)
        n = np.ceil(np.asarray(audio_lengths) / self.hop_length).astype(np.int32)
        return np.minimum(n, frames)

    def encode(self, audio: np.ndarray, audio_lengths=None) -> Tuple[np.ndarray, np.ndarray]:
        """audio [B, T] -> (codes [B, Q, L], code lengths [B])."""
        with self._torch.inference_mode():
            out = self.model.encode(self._batch(audio), n_quantizers=self.num_quantizers)
        codes = out.audio_codes.cpu().numpy()
        return codes, self._code_lengths(audio_lengths, codes.shape[0], codes.shape[2])

    def decode(
        self, indices: np.ndarray, lengths: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, None]:
        """codes [B, Q, L] -> (audio [B, T], None) — ref :204-206."""
        del lengths  # DAC decodes full code grids; caller trims by length
        with self._torch.inference_mode():
            codes = self._torch.from_numpy(np.asarray(indices)).long().to(self.device)
            quantized, _, _ = self.model.quantizer.from_codes(codes)
            wav = self.model.decode(quantized).audio_values
        return wav.squeeze(1).cpu().numpy(), None

    def rec_audio_from_audio(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        del audio_lengths
        with self._torch.inference_mode():
            out = self.model(self._batch(audio), n_quantizers=self.num_quantizers)
        return out.audio_values.squeeze(1).cpu().numpy()

    def get_latent(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        """Unquantized encoder features [B, D, L] (ref :126-127)."""
        del audio_lengths
        with self._torch.inference_mode():
            z = self.model.encoder(self._batch(audio))
        return z.cpu().numpy()


class MimiCodecAdapter:
    """numpy-in/numpy-out facade over Kyutai's Mimi codec.

    Same backend as the reference (HF transformers `MimiModel`,
    initial_codec.py:46-52): encode frames (:107-108), decode with an
    audio-length padding mask (:210-212, mask built :283-296), full
    round-trip via forward (:238-240), unquantized latent via
    encoder -> encoder_transformer -> downsample (:129-135). Torch on host
    CPU — zoo codec for metric comparison, not the TPU serving path.
    """

    name = "mimi"

    def __init__(
        self,
        model_path: Optional[str] = None,
        config=None,
        num_quantizers: Optional[int] = None,
        device: str = "cpu",
    ):
        try:
            import torch
            from transformers import MimiConfig, MimiModel
        except ImportError as e:  # pragma: no cover
            raise ImportError("codec 'mimi' needs transformers+torch") from e
        self._torch = torch
        if model_path is not None:
            self.model = MimiModel.from_pretrained(model_path)
        else:
            self.model = MimiModel(config or MimiConfig())
        self.model.to(device).eval()
        self.config = self.model.config
        self.num_quantizers = num_quantizers
        self.device = device
        # samples per codec frame (frame_rate tokens/s at sampling_rate)
        self.hop_length = int(round(self.config.sampling_rate / self.config.frame_rate))

    @property
    def sample_rate(self) -> int:
        return int(self.config.sampling_rate)

    def _batch(self, audio: np.ndarray):
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        return self._torch.from_numpy(audio[:, None, :]).to(self.device)

    def _padding_mask(self, audio_lengths, batch: int, samples: int):
        """[B, 1, T] bool validity mask — ref get_padding_mask_for_mimi."""
        if audio_lengths is None:
            return self._torch.ones(
                (batch, 1, samples), dtype=self._torch.bool, device=self.device
            )
        mask = np.arange(samples)[None, :] < np.asarray(audio_lengths)[:, None]
        return self._torch.from_numpy(mask[:, None, :]).to(self.device)

    def encode(self, audio: np.ndarray, audio_lengths=None) -> Tuple[np.ndarray, np.ndarray]:
        """audio [B, T] -> (codes [B, Q, L], code lengths [B])."""
        a = self._batch(audio)
        with self._torch.inference_mode():
            out = self.model.encode(
                a,
                padding_mask=self._padding_mask(audio_lengths, a.shape[0], a.shape[2]),
                num_quantizers=self.num_quantizers,
            )
        codes = out.audio_codes.cpu().numpy()
        if audio_lengths is None:
            lens = np.full((codes.shape[0],), codes.shape[2], np.int32)
        else:
            lens = np.minimum(
                np.ceil(np.asarray(audio_lengths) / self.hop_length).astype(np.int32),
                codes.shape[2],
            )
        return codes, lens

    def decode(
        self, indices: np.ndarray, lengths: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, None]:
        """codes [B, Q, L] -> (audio [B, T], None) — ref :210-212."""
        codes = self._torch.from_numpy(np.asarray(indices)).long().to(self.device)
        mask = None
        if lengths is not None:
            mask = self._padding_mask(
                np.asarray(lengths) * self.hop_length,
                codes.shape[0],
                codes.shape[2] * self.hop_length,
            )
        with self._torch.inference_mode():
            wav = self.model.decode(codes, padding_mask=mask).audio_values
        return wav.squeeze(1).cpu().numpy(), None

    def rec_audio_from_audio(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        a = self._batch(audio)
        with self._torch.inference_mode():
            out = self.model(
                a,
                padding_mask=self._padding_mask(audio_lengths, a.shape[0], a.shape[2]),
                num_quantizers=self.num_quantizers,
            )
        return out.audio_values.squeeze(1).cpu().numpy()

    def get_latent(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        """Unquantized downsampled transformer features [B, D, L]
        (ref :129-135: encoder -> encoder_transformer -> downsample)."""
        del audio_lengths
        with self._torch.inference_mode():
            emb = self.model.encoder(self._batch(audio))
            h = self.model.encoder_transformer(emb.transpose(1, 2))[0].transpose(1, 2)
            z = self.model.downsample(h)
        return z.cpu().numpy()


class SpeechTokenizerAdapter:
    """numpy-in/numpy-out facade over the NATIVE JAX SpeechTokenizer
    (models/seanet.py — SEANet encoder/decoder + 8-layer RVQ, golden-tested
    against HF EncodecModel, the same architecture lineage).

    Mirrors the reference's speechtokenizer paths: encode (initial_codec.py
    :101-103 — the reference warns the package returns codebook-first
    [Q, B, L]; this adapter standardizes to [B, Q, L] like the others),
    decode (:204-205), encoder latent (:124), forward_feature sum
    (:161-166). Original-package checkpoints load via
    `load_speechtokenizer(config.json, SpeechTokenizer.pt)`.
    """

    name = "speechtokenizer"

    def __init__(
        self,
        params=None,
        config=None,
        config_json: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        num_quantizers: Optional[int] = None,
        seed: int = 0,
    ):
        from dmel_codec_tpu.models.seanet import (
            SEANetConfig,
            SpeechTokenizer,
            load_speechtokenizer,
        )

        if config_json is not None:
            self.model, loaded, self.config = load_speechtokenizer(
                config_json, ckpt_path
            )
            params = params if params is not None else loaded
        else:
            self.config = config or SEANetConfig()
            self.model = SpeechTokenizer(config=self.config)
        if params is None:
            t = self.config.hop_length * 4
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, t), jnp.float32)
            )["params"]
        self.params = params
        self.num_quantizers = num_quantizers

        self._encode = jax.jit(
            lambda p, a: self.model.apply(
                {"params": p}, a, num_quantizers, method=SpeechTokenizer.encode
            )
        )
        self._decode = jax.jit(
            lambda p, c: self.model.apply(
                {"params": p}, c, method=SpeechTokenizer.decode
            )
        )
        self._latent = jax.jit(
            lambda p, a: self.model.apply(
                {"params": p}, a, method=SpeechTokenizer.encode_unquantized
            )
        )
        self._quantized = jax.jit(
            lambda p, a: self.model.apply(
                {"params": p},
                a,
                num_quantizers,
                method=SpeechTokenizer.forward_feature,
            ).sum(0)
        )

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def _batch(self, audio, audio_lengths):
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        hop = self.config.hop_length
        if audio_lengths is None:
            lens = np.full((audio.shape[0],), audio.shape[1], np.int64)
        else:
            lens = np.asarray(audio_lengths)
        frames = -(-lens // hop)  # ceil
        return jnp.asarray(audio), frames.astype(np.int32)

    def encode(
        self, audio: np.ndarray, audio_lengths=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """audio [B, T] -> (codes [B, Q, L], code lengths [B])."""
        a, frames = self._batch(audio, audio_lengths)
        codes = np.asarray(self._encode(self.params, a))  # [Q, B, L]
        codes = codes.transpose(1, 0, 2)
        return codes, np.minimum(frames, codes.shape[2])

    def decode(
        self, indices: np.ndarray, lengths: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, None]:
        del lengths
        codes = jnp.asarray(np.asarray(indices).transpose(1, 0, 2))
        wav = self._decode(self.params, codes)
        return np.asarray(wav, np.float32), None

    def rec_audio_from_audio(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        idx, lens = self.encode(audio, audio_lengths)
        wav, _ = self.decode(idx, lens)
        return wav

    def get_latent(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        """Unquantized encoder features [B, L, D] (ref :124)."""
        a, _ = self._batch(audio, audio_lengths)
        return np.asarray(self._latent(self.params, a))

    def get_latent_quantized(self, audio: np.ndarray, audio_lengths=None) -> np.ndarray:
        """Summed per-layer quantized features (ref :161-166)."""
        a, _ = self._batch(audio, audio_lengths)
        return np.asarray(self._quantized(self.params, a))


class EncodecAdapter(SpeechTokenizerAdapter):
    """EnCodec flavour of the same native family (the reference's zoo
    docstring lists Encodec, initial_codec.py:6, but never implements it —
    this framework does): causal convs, unidirectional LSTM, no semantic
    head. Defaults to the 24 kHz shape."""

    name = "encodec"

    def __init__(self, params=None, config=None, num_quantizers=None, seed: int = 0):
        from dmel_codec_tpu.models.seanet import SEANetConfig

        super().__init__(
            params=params,
            config=config or SEANetConfig.encodec_24k(),
            num_quantizers=num_quantizers,
            seed=seed,
        )


CODEC_REGISTRY: Dict[str, Callable] = {
    "dmel": DMelCodecAdapter,
    "dac": DacCodecAdapter,
    "speechtokenizer": SpeechTokenizerAdapter,
    "mimi": MimiCodecAdapter,
    "fishspeech": FishSpeechAdapter,
    "encodec": EncodecAdapter,
}


def make_codec(name: str, *args, **kwargs):
    if name not in CODEC_REGISTRY:
        raise KeyError(f"unknown codec '{name}'; have {sorted(CODEC_REGISTRY)}")
    return CODEC_REGISTRY[name](*args, **kwargs)
