"""Native ECAPA-TDNN speaker encoder (JAX) + speechbrain weight converter.

The reference computes speaker similarity with speechbrain's pretrained
`spkrec-ecapa-voxceleb` ECAPA-TDNN (evaluation/evaluation_utils.py:108-130).
speechbrain and its weights cannot be installed here (zero-egress), so this
module provides the architecture natively: the moment an
`embedding_model.ckpt` exists on disk, `ecapa_params_from_torch_state_dict`
converts it and `embed()` produces embeddings on the JAX device — no
speechbrain import required.

Architecture (speechbrain lobes/models/ECAPA_TDNN.py, voxceleb config):
  TDNN(80->1024, k5) -> 3x SE-Res2Net blocks (k3, dilations 2/3/4,
  res2net scale 8, SE bottleneck 128) -> MFA concat -> TDNN(3072, k1) ->
  attentive statistics pooling (global context, 128 attn channels) ->
  BN -> 1x1 conv to the 192-dim embedding. Convs are reflect-padded
  "same"; BatchNorm runs in eval mode from converted running stats.

Front end mirrors speechbrain Fbank defaults (16 kHz, 25 ms hamming
window / 10 ms hop, |X|^2 power spectrum, 80 HTK-mel triangular filters,
10*log10 with amin 1e-10 and top_db 80) followed by per-utterance mean
subtraction (InputNormalization norm_type="sentence", std_norm=False).

Embedding-level parity against real speechbrain weights cannot be asserted
in this environment; tests/test_ecapa.py proves the converter/key contract
(synthetic state dict in speechbrain's exact key layout), shape/cosine
wiring, and mask correctness.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.utils import torch_compat as tc

# voxceleb flagship hyperparameters
CHANNELS = 1024
EMB_DIM = 192
SE_CHANNELS = 128
ATTN_CHANNELS = 128
RES2NET_SCALE = 8
KERNELS = (5, 3, 3, 3)
DILATIONS = (1, 2, 3, 4)
BN_EPS = 1e-5
STAT_EPS = 1e-12


# --------------------------------------------------------------------------
# fbank front end (16 kHz)
# --------------------------------------------------------------------------
def _htk_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _htk_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def _triangular_filterbank(n_mels: int, n_fft: int, sr: int, f_max: float):
    """HTK-mel triangular filters, no area norm (speechbrain Filterbank)."""
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = _htk_hz(np.linspace(_htk_mel(0.0), _htk_mel(f_max), n_mels + 2))
    fb = np.zeros((n_fft // 2 + 1, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (freqs - lo) / (ctr - lo)
        down = (hi - freqs) / (hi - ctr)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def ecapa_fbank(audio_16k: jnp.ndarray) -> jnp.ndarray:
    """[B, L] 16 kHz waveform -> [B, T, 80] mean-normalised log-fbanks."""
    n_fft, win, hop = 400, 400, 160
    x = jnp.asarray(audio_16k, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    # center pad (constant), frame, hamming (periodic), rFFT power
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)))
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :]
    frames = x[:, idx]  # [B, T, win]
    window = jnp.asarray(np.hamming(win + 1)[:-1], jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(frames * window, n=n_fft, axis=-1)) ** 2
    fb = jnp.asarray(_triangular_filterbank(80, n_fft, 16000, 8000.0))
    mels = spec @ fb
    db = 10.0 * jnp.log10(jnp.maximum(mels, 1e-10))
    db = jnp.maximum(db, db.max() - 80.0)  # top_db clamp
    return db - db.mean(axis=(1,), keepdims=True)  # sentence mean-norm


# --------------------------------------------------------------------------
# params: init + converter
# --------------------------------------------------------------------------
def _conv_init(rng, k, cin, cout):
    # kaiming-uniform fan_in (torch Conv1d default): bound = 1/sqrt(k*cin)
    b = 1.0 / math.sqrt(k * cin)
    k1, k2 = jax.random.split(rng)
    return {
        "kernel": jax.random.uniform(k1, (k, cin, cout), jnp.float32, -b, b),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -b, b),
    }


def _bn_init(c):
    return {
        "weight": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "running_mean": jnp.zeros((c,)),
        "running_var": jnp.ones((c,)),
    }


def _tdnn_init(rng, k, cin, cout):
    return {"conv": _conv_init(rng, k, cin, cout), "bn": _bn_init(cout)}


def init_ecapa_params(
    rng: jax.Array,
    input_size: int = 80,
    channels: int = CHANNELS,
    emb_dim: int = EMB_DIM,
    res2net_scale: int = RES2NET_SCALE,
    se_channels: int = SE_CHANNELS,
    attn_channels: int = ATTN_CHANNELS,
) -> dict:
    """Random-init params in the converter's exact tree (wiring tests)."""
    ks = iter(jax.random.split(rng, 64))
    p: dict = {"block0": _tdnn_init(next(ks), KERNELS[0], input_size, channels)}
    width = channels // res2net_scale
    for li in (1, 2, 3):
        layer = {
            "tdnn1": _tdnn_init(next(ks), 1, channels, channels),
            "res2net": [
                _tdnn_init(next(ks), KERNELS[li], width, width)
                for _ in range(res2net_scale - 1)
            ],
            "tdnn2": _tdnn_init(next(ks), 1, channels, channels),
            "se": {
                "conv1": _conv_init(next(ks), 1, channels, se_channels),
                "conv2": _conv_init(next(ks), 1, se_channels, channels),
            },
        }
        p[f"layer{li}"] = layer
    p["mfa"] = _tdnn_init(next(ks), 1, 3 * channels, 3 * channels)
    p["asp"] = {
        "tdnn": _tdnn_init(next(ks), 1, 9 * channels, attn_channels),
        "conv": _conv_init(next(ks), 1, attn_channels, 3 * channels),
    }
    p["asp_bn"] = _bn_init(6 * channels)
    p["fc"] = _conv_init(next(ks), 1, 6 * channels, emb_dim)
    return p


def _t_conv(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "kernel": tc.conv1d_kernel(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _t_bn(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "weight": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "running_mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "running_var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def _t_tdnn(sd, prefix: str) -> dict:
    return {
        "conv": _t_conv(sd, f"{prefix}.conv.conv"),
        "bn": _t_bn(sd, f"{prefix}.norm.norm"),
    }


def ecapa_params_from_torch_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """speechbrain ECAPA_TDNN `embedding_model.ckpt` state dict -> params.

    Key layout per speechbrain lobes/models/ECAPA_TDNN.py: `blocks.0` TDNN,
    `blocks.1..3` SERes2NetBlock (tdnn1 / res2net_block.blocks.{i} / tdnn2 /
    se_block.conv{1,2}), `mfa`, `asp` (tdnn + conv), `asp_bn`, `fc`.
    The res2net scale is inferred from the branch count in the state dict.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    res2net_scale = 1 + sum(
        1
        for k in sd
        if k.startswith("blocks.1.res2net_block.blocks.")
        and k.endswith(".conv.conv.weight")
    )
    p: dict = {"block0": _t_tdnn(sd, "blocks.0")}
    for li in (1, 2, 3):
        bp = f"blocks.{li}"
        p[f"layer{li}"] = {
            "tdnn1": _t_tdnn(sd, f"{bp}.tdnn1"),
            "res2net": [
                _t_tdnn(sd, f"{bp}.res2net_block.blocks.{i}")
                for i in range(res2net_scale - 1)
            ],
            "tdnn2": _t_tdnn(sd, f"{bp}.tdnn2"),
            "se": {
                "conv1": _t_conv(sd, f"{bp}.se_block.conv1.conv"),
                "conv2": _t_conv(sd, f"{bp}.se_block.conv2.conv"),
            },
        }
    p["mfa"] = _t_tdnn(sd, "mfa")
    p["asp"] = {
        "tdnn": _t_tdnn(sd, "asp.tdnn"),
        "conv": _t_conv(sd, "asp.conv.conv"),
    }
    p["asp_bn"] = _t_bn(sd, "asp_bn.norm")
    p["fc"] = _t_conv(sd, "fc.conv")
    return p


def load_ecapa_checkpoint(path: str) -> dict:
    """Torch `embedding_model.ckpt` file -> native params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return ecapa_params_from_torch_state_dict(
        {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    )


# --------------------------------------------------------------------------
# forward (eval mode, channels-last [B, T, C])
# --------------------------------------------------------------------------
def _conv1d_same(x, p, dilation: int = 1):
    k = p["kernel"].shape[0]
    pad = dilation * (k - 1)
    if pad:
        x = jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x,
        p["kernel"],
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + p["bias"]


def _bn(x, p):
    inv = jax.lax.rsqrt(p["running_var"] + BN_EPS)
    return (x - p["running_mean"]) * inv * p["weight"] + p["bias"]


def _tdnn(x, p, dilation: int = 1):
    return _bn(jax.nn.relu(_conv1d_same(x, p["conv"], dilation)), p["bn"])


def _masked_stats(x, mask, eps: float = STAT_EPS):
    """mask [B, T, 1] -> (mean, std) over time, each [B, C]."""
    total = jnp.maximum(mask.sum(axis=1), 1.0)
    mean = (x * mask).sum(axis=1) / total
    var = ((x - mean[:, None, :]) ** 2 * mask).sum(axis=1) / total
    return mean, jnp.sqrt(jnp.maximum(var, eps))


def _se_block(x, p, mask):
    s = (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
    s = jax.nn.relu(s @ p["conv1"]["kernel"][0] + p["conv1"]["bias"])
    s = jax.nn.sigmoid(s @ p["conv2"]["kernel"][0] + p["conv2"]["bias"])
    return x * s[:, None, :]


def _res2net(x, blocks, dilation: int, scale: int):
    chunks = jnp.split(x, scale, axis=-1)
    ys = [chunks[0]]
    y = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn(inp, blocks[i - 1], dilation)
        ys.append(y)
    return jnp.concatenate(ys, axis=-1)


def _se_res2net_layer(x, p, dilation: int, mask):
    # res2net scale is implied by the params: channels / per-branch width
    scale = p["tdnn1"]["conv"]["kernel"].shape[2] // p["res2net"][0]["conv"][
        "kernel"
    ].shape[1]
    residual = x
    x = _tdnn(x, p["tdnn1"])
    x = _res2net(x, p["res2net"], dilation, scale)
    x = _tdnn(x, p["tdnn2"])
    x = _se_block(x, p["se"], mask)
    return x + residual


def embed(
    params: dict,
    fbanks: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[B, T, 80] fbanks (+ frame lengths) -> L2-unnormalised [B, emb]."""
    b, t, _ = fbanks.shape
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)[..., None]

    x = _tdnn(fbanks * mask, params["block0"], DILATIONS[0])
    outs = []
    for li in (1, 2, 3):
        x = _se_res2net_layer(x, params[f"layer{li}"], DILATIONS[li], mask)
        outs.append(x)
    x = _tdnn(jnp.concatenate(outs, axis=-1), params["mfa"])

    # attentive statistics pooling with global context
    mean, std = _masked_stats(x * mask, mask)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean[:, None, :], x.shape),
         jnp.broadcast_to(std[:, None, :], x.shape)],
        axis=-1,
    )
    attn = jnp.tanh(_tdnn(ctx, params["asp"]["tdnn"]))
    attn = _conv1d_same(attn, params["asp"]["conv"])
    attn = jnp.where(mask > 0, attn, -jnp.inf)
    attn = jax.nn.softmax(attn, axis=1)
    mu = (attn * x).sum(axis=1)
    sg = jnp.sqrt(
        jnp.maximum((attn * x**2).sum(axis=1) - mu**2, STAT_EPS)
    )
    pooled = jnp.concatenate([mu, sg], axis=-1)
    pooled = _bn(pooled, params["asp_bn"])
    return pooled @ params["fc"]["kernel"][0] + params["fc"]["bias"]


def embed_audio(params: dict, audio_16k: np.ndarray) -> np.ndarray:
    """Waveform [L] or [B, L] @16 kHz -> embeddings [B, emb]."""
    fb = ecapa_fbank(jnp.asarray(audio_16k, jnp.float32))
    return np.asarray(embed(params, fb))


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
