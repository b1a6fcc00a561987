"""SEANet + residual-VQ codec family (EnCodec / SpeechTokenizer), native JAX.

The reference's codec zoo compares against SpeechTokenizer via the external
`speechtokenizer` package (initial_codec.py:25-31, encode :101-103, decode
:204-205, encoder latent :124, forward_feature :161-166) and lists EnCodec
in the same family (initial_codec.py:6). Neither package ships here, so
this module implements the shared architecture from scratch, TPU-first:

- channels-last [B, T, C] conv stacks (MXU-friendly NWC layout),
- the LSTM bottleneck as one batched input projection (a single MXU matmul
  over the whole sequence) + a `lax.scan` recurrence,
- residual vector quantization as a `lax.scan` over a stacked [Q, N, D]
  codebook tensor with the nearest-neighbour search expressed as a matmul.

SpeechTokenizer (arXiv:2308.16692) is EnCodec's SEANet encoder/decoder with
a BIDIRECTIONAL 2-layer LSTM in the encoder (skip connection duplicates the
input along channels), an 8-layer RVQ, and a linear `transform` head that
maps dimension -> semantic_dimension for distillation. EnCodec semantics
(padding rules, resblock layout, weight-norm parametrization) follow the
original facebookresearch/encodec modules, cross-checked numerically
against HF transformers' `EncodecModel` in tests/test_seanet.py.

Converters accept both torch naming schemes: HF transformers
(`encoder.layers.N...parametrizations.weight.original0/1`) and the original
package layout used by speechtokenizer checkpoints
(`encoder.model.N.conv.conv.weight_g/weight_v`).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.nn.conv import conv_transpose1d
from dmel_codec_tpu.nn.weight_norm import weight_norm_kernel


@dataclasses.dataclass(frozen=True)
class SEANetConfig:
    """Shared config for the EnCodec / SpeechTokenizer architecture family.

    Field names follow the speechtokenizer config.json keys where they
    exist; `ratios` is in DECODER (upsampling) order, the encoder walks it
    reversed — exactly like EnCodec (modeling_encodec.py SEANetEncoder).
    """

    sample_rate: int = 16000
    audio_channels: int = 1
    n_filters: int = 64
    dimension: int = 1024  # latent width (EnCodec hidden_size)
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    n_residual_layers: int = 1
    compress: int = 2
    lstm_layers: int = 2
    bidirectional: bool = True  # encoder LSTM (SpeechTokenizer); EnCodec: False
    causal: bool = False  # SpeechTokenizer: False; EnCodec 24k: True
    pad_mode: str = "reflect"
    trim_right_ratio: float = 1.0
    use_conv_shortcut: bool = True  # true_skip=False in EnCodec terms
    # quantizer
    n_q: int = 8
    codebook_size: int = 1024
    # semantic head (SpeechTokenizer only; None/equal dims -> identity)
    semantic_dimension: Optional[int] = 768

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @staticmethod
    def speechtokenizer(**overrides) -> "SEANetConfig":
        """Flagship SpeechTokenizer config (the package's config.json)."""
        return SEANetConfig(**overrides)

    @staticmethod
    def encodec_24k(**overrides) -> "SEANetConfig":
        """facebook/encodec_24khz-shaped config."""
        base = dict(
            sample_rate=24000,
            n_filters=32,
            dimension=128,
            ratios=(8, 5, 4, 2),
            bidirectional=False,
            causal=True,
            n_q=32,
            codebook_size=1024,
            semantic_dimension=None,
        )
        base.update(overrides)
        return SEANetConfig(**base)

    @staticmethod
    def from_json(path: str, **overrides) -> "SEANetConfig":
        """Load a speechtokenizer-style config.json (the dict the package's
        SpeechTokenizer.load_from_checkpoint reads)."""
        with open(path) as f:
            raw = json.load(f)
        mapped = dict(
            sample_rate=int(raw.get("sample_rate", 16000)),
            n_filters=int(raw.get("n_filters", 64)),
            dimension=int(raw.get("dimension", 1024)),
            ratios=tuple(raw.get("strides", (8, 5, 4, 2))),
            residual_kernel_size=int(raw.get("residual_kernel_size", 3)),
            dilation_base=int(raw.get("dilation_base", 2)),
            n_residual_layers=int(raw.get("n_residual_layers", 1)),
            lstm_layers=int(raw.get("lstm_layers", 2)),
            bidirectional=bool(raw.get("bidirectional", True)),
            n_q=int(raw.get("n_q", 8)),
            codebook_size=int(raw.get("codebook_size", 1024)),
            semantic_dimension=raw.get("semantic_dimension", 768),
        )
        mapped.update(overrides)
        return SEANetConfig(**mapped)


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Torch-semantics 1-D pad on the time axis of [B, T, C].

    Replicates EncodecConv1d._pad1d: reflect padding on inputs shorter than
    the pad width gets a temporary zero extension (torch reflect would
    error), trimmed back after reflection.
    """
    if left == 0 and right == 0:
        return x
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    length = x.shape[1]
    max_pad = max(left, right)
    extra = max_pad - length + 1 if length <= max_pad else 0
    if extra:
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    y = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    return y[:, : y.shape[1] - extra] if extra else y


class SEANetConv1d(nn.Module):
    """Weight-normalised conv with EnCodec's causal/asymmetric padding.

    Matches EncodecConv1d.forward: padding_total = k_eff - stride; causal
    pads fully left; non-causal splits with the LARGER half left; an extra
    right pad rounds the input up to a whole number of frames. Shapes are
    static under jit, so the frame math runs in Python at trace time.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        padding_total = k_eff - self.stride
        length = x.shape[1]
        n_frames = (length - k_eff + padding_total) / self.stride + 1
        ideal = (int(np.ceil(n_frames)) - 1) * self.stride + k_eff - padding_total
        extra = ideal - length
        if self.causal:
            x = _pad1d(x, padding_total, extra, self.pad_mode)
        else:
            right = padding_total // 2
            x = _pad1d(x, padding_total - right, right + extra, self.pad_mode)

        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features),
        )
        g = self.param(
            "g",
            lambda rng, s: jnp.sqrt(jnp.sum(v**2, axis=(0, 1))),
            (self.features,),
        )
        kernel = weight_norm_kernel(v, g, axis=2)
        dtype = jnp.result_type(x.dtype, kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride,),
            padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + bias


class SEANetConvTranspose1d(nn.Module):
    """Weight-normalised transposed conv with EnCodec's output trimming
    (EncodecConvTranspose1d.forward): full transposed conv, then unpad
    padding_total = k - stride split causally or evenly."""

    features: int
    kernel_size: int
    stride: int
    causal: bool = False
    trim_right_ratio: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        # torch weight_norm dim=0 on the [in, out, k] transposed weight:
        # one g per INPUT channel
        g = self.param(
            "g",
            lambda rng, s: jnp.sqrt(jnp.sum(v**2, axis=(0, 2))),
            (in_ch,),
        )
        kernel = weight_norm_kernel(v, g, axis=1)
        y = conv_transpose1d(x, kernel, self.stride, padding=0)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = y + bias
        padding_total = self.kernel_size - self.stride
        if self.causal:
            right = int(np.ceil(padding_total * self.trim_right_ratio))
        else:
            right = padding_total // 2
        left = padding_total - right
        return y[:, left : y.shape[1] - right]


class SEANetResnetBlock(nn.Module):
    """ELU→conv(k, dilated, dim→dim/compress)→ELU→conv(1, →dim) + shortcut
    (EncodecResnetBlock)."""

    dim: int
    dilation: int
    cfg: SEANetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim // self.cfg.compress
        y = jax.nn.elu(x)
        y = SEANetConv1d(
            hidden,
            self.cfg.residual_kernel_size,
            dilation=self.dilation,
            causal=self.cfg.causal,
            pad_mode=self.cfg.pad_mode,
            name="conv1",
        )(y)
        y = jax.nn.elu(y)
        y = SEANetConv1d(
            self.dim,
            1,
            causal=self.cfg.causal,
            pad_mode=self.cfg.pad_mode,
            name="conv2",
        )(y)
        if self.cfg.use_conv_shortcut:
            x = SEANetConv1d(
                self.dim,
                1,
                causal=self.cfg.causal,
                pad_mode=self.cfg.pad_mode,
                name="shortcut",
            )(x)
        return x + y


def _lstm_pass(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    reverse: bool,
) -> jnp.ndarray:
    """One torch-layout LSTM direction over [B, T, C].

    The input projection for ALL timesteps is one [B·T, C]×[C, 4H] matmul
    (MXU); only the [B, H]×[H, 4H] recurrence stays inside `lax.scan`.
    Gate order i, f, g, o (torch).
    """
    h_dim = w_hh.shape[1]
    xg = jnp.einsum("btc,gc->btg", x, w_ih) + b_ih + b_hh  # [B, T, 4H]

    def step(carry, xg_t):
        h, c = carry
        gates = xg_t + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((x.shape[0], h_dim), x.dtype),
        jnp.zeros((x.shape[0], h_dim), x.dtype),
    )
    # scan over time; reverse=True walks from the end and still emits
    # outputs in forward order — exactly the torch backward direction
    _, ys = jax.lax.scan(step, init, jnp.swapaxes(xg, 0, 1), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


class SLSTM(nn.Module):
    """EnCodec/SpeechTokenizer LSTM block with skip connection.

    Torch-parameter layout (weight_ih_l{n}[ _reverse] [4H, in]) so torch
    checkpoints convert by transpose only. Bidirectional output is
    [fwd ⊕ bwd] and the skip duplicates the input channels, matching
    speechtokenizer's modified SLSTM (EnCodec: unidirectional, y + x).
    """

    features: int
    num_layers: int = 2
    bidirectional: bool = False
    skip: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.features
        y = x
        for layer in range(self.num_layers):
            in_dim = y.shape[-1]

            def p(name, shape):
                return self.param(
                    name, nn.initializers.lecun_normal(), shape
                )

            w_ih = p(f"weight_ih_l{layer}", (4 * h, in_dim))
            w_hh = p(f"weight_hh_l{layer}", (4 * h, h))
            b_ih = self.param(f"bias_ih_l{layer}", nn.initializers.zeros, (4 * h,))
            b_hh = self.param(f"bias_hh_l{layer}", nn.initializers.zeros, (4 * h,))
            fwd = _lstm_pass(y, w_ih, w_hh, b_ih, b_hh, reverse=False)
            if self.bidirectional:
                w_ih_r = p(f"weight_ih_l{layer}_reverse", (4 * h, in_dim))
                w_hh_r = p(f"weight_hh_l{layer}_reverse", (4 * h, h))
                b_ih_r = self.param(
                    f"bias_ih_l{layer}_reverse", nn.initializers.zeros, (4 * h,)
                )
                b_hh_r = self.param(
                    f"bias_hh_l{layer}_reverse", nn.initializers.zeros, (4 * h,)
                )
                bwd = _lstm_pass(y, w_ih_r, w_hh_r, b_ih_r, b_hh_r, reverse=True)
                y = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                y = fwd
        if self.skip:
            if self.bidirectional:
                x = jnp.concatenate([x, x], axis=-1)
            y = y + x
        return y


class SEANetEncoder(nn.Module):
    """audio [B, T, 1] -> latent [B, L, dimension] (EncodecEncoder layout,
    + optional bidirectional LSTM per SpeechTokenizer)."""

    cfg: SEANetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        y = SEANetConv1d(
            c.n_filters, c.kernel_size, causal=c.causal, pad_mode=c.pad_mode,
            name="conv_in",
        )(x)
        mult = 1
        for s, ratio in enumerate(reversed(c.ratios)):
            width = mult * c.n_filters
            for j in range(c.n_residual_layers):
                y = SEANetResnetBlock(
                    width, c.dilation_base**j, c, name=f"res{s}_{j}"
                )(y)
            y = jax.nn.elu(y)
            y = SEANetConv1d(
                width * 2,
                ratio * 2,
                stride=ratio,
                causal=c.causal,
                pad_mode=c.pad_mode,
                name=f"down{s}",
            )(y)
            mult *= 2
        y = SLSTM(
            mult * c.n_filters,
            c.lstm_layers,
            bidirectional=c.bidirectional,
            name="lstm",
        )(y)
        y = jax.nn.elu(y)
        return SEANetConv1d(
            c.dimension, c.last_kernel_size, causal=c.causal,
            pad_mode=c.pad_mode, name="conv_out",
        )(y)


class SEANetDecoder(nn.Module):
    """latent [B, L, dimension] -> audio [B, T, audio_channels]
    (EncodecDecoder; LSTM always unidirectional here)."""

    cfg: SEANetConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        mult = int(2 ** len(c.ratios))
        y = SEANetConv1d(
            mult * c.n_filters, c.kernel_size, causal=c.causal,
            pad_mode=c.pad_mode, name="conv_in",
        )(z)
        y = SLSTM(mult * c.n_filters, c.lstm_layers, name="lstm")(y)
        for s, ratio in enumerate(c.ratios):
            width = mult * c.n_filters
            y = jax.nn.elu(y)
            y = SEANetConvTranspose1d(
                width // 2,
                ratio * 2,
                stride=ratio,
                causal=c.causal,
                trim_right_ratio=c.trim_right_ratio,
                name=f"up{s}",
            )(y)
            for j in range(c.n_residual_layers):
                y = SEANetResnetBlock(
                    width // 2, c.dilation_base**j, c, name=f"res{s}_{j}"
                )(y)
            mult //= 2
        y = jax.nn.elu(y)
        return SEANetConv1d(
            c.audio_channels, c.last_kernel_size, causal=c.causal,
            pad_mode=c.pad_mode, name="conv_out",
        )(y)


class ResidualVQ(nn.Module):
    """Euclidean residual vector quantizer over stacked codebooks [Q, N, D].

    encode: `lax.scan` peels quantizers off the residual; the per-layer
    nearest-neighbour search is argmax of -(‖x‖² - 2x·Eᵀ + ‖e‖²) — one
    [B·L, D]×[D, N] MXU matmul per layer (EncodecEuclideanCodebook.quantize).
    """

    num_quantizers: int
    codebook_size: int
    dim: int

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, self.dim),
        )

    @staticmethod
    def _nearest(residual: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
        # residual [B, L, D], codebook [N, D] -> indices [B, L]
        dots = jnp.einsum("bld,nd->bln", residual, codebook)
        sq = jnp.sum(codebook**2, axis=-1)
        return jnp.argmax(2 * dots - sq[None, None, :], axis=-1)

    def encode(
        self, z: jnp.ndarray, n_q: Optional[int] = None, st: int = 0
    ) -> jnp.ndarray:
        """z [B, L, D] -> codes [n_q - st, B, L] (speechtokenizer's
        quantizer.encode runs layers[st:n_q] on the raw features)."""
        n_q = self.num_quantizers if n_q is None else n_q
        books = self.codebooks[st:n_q].astype(z.dtype)

        def step(residual, codebook):
            idx = self._nearest(residual, codebook)
            return residual - codebook[idx], idx

        _, codes = jax.lax.scan(step, z, books)
        return codes

    def decode(self, codes: jnp.ndarray, st: int = 0) -> jnp.ndarray:
        """codes [Q', B, L] -> features [B, L, D], summing layers st..."""
        books = self.codebooks[st : st + codes.shape[0]]

        def step(acc, layer):
            codebook, idx = layer
            return acc + codebook[idx], None

        zero = jnp.zeros(
            (codes.shape[1], codes.shape[2], self.dim), books.dtype
        )
        out, _ = jax.lax.scan(step, zero, (books, codes))
        return out

    def decode_layers(self, codes: jnp.ndarray, st: int = 0) -> jnp.ndarray:
        """Per-layer quantized features [Q', B, L, D] (the package's
        forward_feature, summed by the reference at initial_codec.py:163-166)."""
        books = self.codebooks[st : st + codes.shape[0]]
        return jax.vmap(lambda cb, idx: cb[idx])(books, codes)


class SpeechTokenizer(nn.Module):
    """SpeechTokenizer / EnCodec model surface (encode/decode/latents).

    Mirrors the package API the reference calls: `encode(audio) -> codes
    [n_q, B, L]` (initial_codec.py:101-103 — the reference itself warns the
    layout is codebook-first), `decode(codes) -> audio` (:204-205),
    `encoder features` (:124), `forward_feature` per-layer quantized
    (:161-166). With `bidirectional=False, semantic_dimension=None` this is
    exactly EnCodec (24 kHz flavour with causal=True).
    """

    config: SEANetConfig = SEANetConfig()

    def setup(self):
        c = self.config
        self.encoder = SEANetEncoder(c)
        self.decoder = SEANetDecoder(c)
        self.quantizer = ResidualVQ(c.n_q, c.codebook_size, c.dimension)
        if c.semantic_dimension and c.semantic_dimension != c.dimension:
            self.transform = nn.Dense(c.semantic_dimension)

    def _as_btc(self, audio: jnp.ndarray) -> jnp.ndarray:
        if audio.ndim == 2:
            audio = audio[..., None]
        return audio

    def encode_unquantized(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio [B, T] -> encoder latent [B, L, D] (ref :124)."""
        return self.encoder(self._as_btc(audio))

    def encode(
        self, audio: jnp.ndarray, n_q: Optional[int] = None, st: int = 0
    ) -> jnp.ndarray:
        """audio [B, T] -> codes [n_q, B, L]."""
        return self.quantizer.encode(self.encode_unquantized(audio), n_q, st)

    def decode(self, codes: jnp.ndarray, st: int = 0) -> jnp.ndarray:
        """codes [Q', B, L] -> audio [B, T]."""
        features = self.quantizer.decode(codes, st)
        return self.decoder(features)[..., 0]

    def forward_feature(
        self, audio: jnp.ndarray, n_q: Optional[int] = None
    ) -> jnp.ndarray:
        """Per-RVQ-layer quantized features [Q, B, L, D]."""
        codes = self.encode(audio, n_q)
        return self.quantizer.decode_layers(codes)

    def semantic_features(self, audio: jnp.ndarray) -> jnp.ndarray:
        """RVQ-layer-0 features through the semantic head [B, L, S]."""
        q0 = self.forward_feature(audio, n_q=1)[0]
        if hasattr(self, "transform"):
            return self.transform(q0)
        return q0

    def __call__(self, audio: jnp.ndarray, n_q: Optional[int] = None):
        """Round trip for init/training: (rec_audio [B, T], codes)."""
        codes = self.encode(audio, n_q)
        if hasattr(self, "transform"):
            # touch the semantic head so init creates its params; the
            # unused result is dead-code-eliminated under jit
            self.transform(self.quantizer.decode(codes[:1]))
        return self.decode(codes), codes


# ---------------------------------------------------------------------------
# torch checkpoint converters
# ---------------------------------------------------------------------------


def _wn_pair(sd: dict, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """Fetch (g, v) under either torch weight-norm naming scheme."""
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    else:
        g = sd[f"{prefix}.weight_g"]
        v = sd[f"{prefix}.weight_v"]
    return np.asarray(g), np.asarray(v)


def _conv_params(sd: dict, prefix: str) -> dict:
    """torch Conv1d weight-norm [out, in, k] -> ours v [k, in, out], g [out]."""
    g, v = _wn_pair(sd, prefix)
    return {
        "v": np.transpose(v, (2, 1, 0)),
        "g": g.reshape(-1),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _convtr_params(sd: dict, prefix: str) -> dict:
    """torch ConvTranspose1d weight-norm [in, out, k] -> v [k, in, out],
    g [in] (weight_norm dim=0 = input channels)."""
    g, v = _wn_pair(sd, prefix)
    return {
        "v": np.transpose(v, (2, 0, 1)),
        "g": g.reshape(-1),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _lstm_params(sd: dict, prefix: str, layers: int, bidirectional: bool) -> dict:
    out = {}
    names = ["weight_ih_l{n}", "weight_hh_l{n}", "bias_ih_l{n}", "bias_hh_l{n}"]
    suffixes = [""] + (["_reverse"] if bidirectional else [])
    for n in range(layers):
        for suf in suffixes:
            for tmpl in names:
                key = tmpl.format(n=n) + suf
                out[key] = np.asarray(sd[f"{prefix}.{key}"])
    return out


def _seanet_layer_indices(cfg: SEANetConfig, encoder: bool):
    """Reproduce the sequential indices EnCodec/speechtokenizer assign to
    their nn.Sequential-style layer list (ELUs occupy slots)."""
    idx = 0
    out = {"convs": {}, "res": {}, "ups": {}}
    out["conv_in"] = idx
    idx += 1
    if encoder:
        for s, _ratio in enumerate(reversed(cfg.ratios)):
            for j in range(cfg.n_residual_layers):
                out["res"][(s, j)] = idx
                idx += 1
            idx += 1  # ELU
            out["convs"][s] = idx
            idx += 1
        out["lstm"] = idx
        idx += 1
        idx += 1  # ELU
        out["conv_out"] = idx
    else:
        out["lstm"] = idx
        idx += 1
        for s, _ratio in enumerate(cfg.ratios):
            idx += 1  # ELU
            out["ups"][s] = idx
            idx += 1
            for j in range(cfg.n_residual_layers):
                out["res"][(s, j)] = idx
                idx += 1
        idx += 1  # ELU
        out["conv_out"] = idx
    return out


def speechtokenizer_params_from_torch(
    state_dict: dict, cfg: SEANetConfig, hf_naming: bool = False
) -> dict:
    """Map a torch SpeechTokenizer / HF EncodecModel state_dict onto the
    flax param tree of `SpeechTokenizer`.

    hf_naming=False: original package layout — `encoder.model.N.conv.conv.*`,
    `decoder.model.N.convtr.convtr.*`, `quantizer.vq.layers.Q._codebook.embed`,
    `transform.{weight,bias}`.
    hf_naming=True: HF transformers EncodecModel — `encoder.layers.N.conv.*`
    (resblocks as `block.{1,3}` + `shortcut`), `quantizer.layers.Q.codebook.embed`.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv_prefix(tower: str, i: int, transposed: bool) -> str:
        if hf_naming:
            return f"{tower}.layers.{i}.conv"
        inner = "convtr.convtr" if transposed else "conv.conv"
        return f"{tower}.model.{i}.{inner}"

    def res_block(tower: str, i: int) -> dict:
        base = f"{tower}.layers.{i}" if hf_naming else f"{tower}.model.{i}"
        # block.1 / block.3 are the two convs (ELUs at 0 and 2)
        inner = "conv" if hf_naming else "conv.conv"
        blk = {
            "conv1": _conv_params(sd, f"{base}.block.1.{inner}"),
            "conv2": _conv_params(sd, f"{base}.block.3.{inner}"),
        }
        if cfg.use_conv_shortcut:
            blk["shortcut"] = _conv_params(sd, f"{base}.shortcut.{inner}")
        return blk

    def lstm_prefix(tower: str, i: int) -> str:
        return (
            f"{tower}.layers.{i}.lstm" if hf_naming else f"{tower}.model.{i}.lstm"
        )

    enc_idx = _seanet_layer_indices(cfg, encoder=True)
    dec_idx = _seanet_layer_indices(cfg, encoder=False)

    encoder = {
        "conv_in": _conv_params(sd, conv_prefix("encoder", enc_idx["conv_in"], False)),
        "conv_out": _conv_params(
            sd, conv_prefix("encoder", enc_idx["conv_out"], False)
        ),
        "lstm": _lstm_params(
            sd,
            lstm_prefix("encoder", enc_idx["lstm"]),
            cfg.lstm_layers,
            cfg.bidirectional,
        ),
    }
    for s in enc_idx["convs"]:
        encoder[f"down{s}"] = _conv_params(
            sd, conv_prefix("encoder", enc_idx["convs"][s], False)
        )
    for (s, j), i in enc_idx["res"].items():
        encoder[f"res{s}_{j}"] = res_block("encoder", i)

    decoder = {
        "conv_in": _conv_params(sd, conv_prefix("decoder", dec_idx["conv_in"], False)),
        "conv_out": _conv_params(
            sd, conv_prefix("decoder", dec_idx["conv_out"], False)
        ),
        "lstm": _lstm_params(
            sd, lstm_prefix("decoder", dec_idx["lstm"]), cfg.lstm_layers, False
        ),
    }
    for s in dec_idx["ups"]:
        decoder[f"up{s}"] = _convtr_params(
            sd, conv_prefix("decoder", dec_idx["ups"][s], True)
        )
    for (s, j), i in dec_idx["res"].items():
        decoder[f"res{s}_{j}"] = res_block("decoder", i)

    if hf_naming:
        books = [
            sd[f"quantizer.layers.{q}.codebook.embed"] for q in range(cfg.n_q)
        ]
    else:
        books = [
            sd[f"quantizer.vq.layers.{q}._codebook.embed"] for q in range(cfg.n_q)
        ]
    params = {
        "encoder": encoder,
        "decoder": decoder,
        "quantizer": {"codebooks": np.stack(books).astype(np.float32)},
    }
    if cfg.semantic_dimension and cfg.semantic_dimension != cfg.dimension:
        params["transform"] = {
            "kernel": np.asarray(sd["transform.weight"]).T,
            "bias": np.asarray(sd["transform.bias"]),
        }
    return jax.tree.map(jnp.asarray, params)


def load_speechtokenizer(
    config_json: str, ckpt_path: Optional[str] = None
) -> Tuple[SpeechTokenizer, Optional[dict], SEANetConfig]:
    """Parity with the package's SpeechTokenizer.load_from_checkpoint
    (config.json + SpeechTokenizer.pt): returns (model, params|None, cfg).
    ckpt_path=None skips weights (random-init use)."""
    cfg = SEANetConfig.from_json(config_json)
    model = SpeechTokenizer(config=cfg)
    params = None
    if ckpt_path is not None:
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        params = speechtokenizer_params_from_torch(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
    return model, params, cfg
