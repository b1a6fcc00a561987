"""Streaming (chunked) codec inference: bounded device memory for
arbitrarily long audio, with EXACT outputs.

The reference caps clip length in the data pipeline (30–40 s filters,
3 s training windows — SURVEY §5 "long-context"); serving hour-long audio
on one chip needs neither that nor the multi-chip sequence-parallel path
(parallel/sequence.py). This module processes the frame axis in fixed-size
windows of W = chunk + 2·halo frames, emitting only the central chunk:

  * interior chunks carry `halo` frames of REAL neighbours on both sides
    — at least the path's receptive field, so the emitted region matches
    the full-signal computation exactly;
  * edge chunks CLAMP the window inside the signal (window edge ==
    true signal boundary), so every layer's 'SAME' zero padding falls
    exactly where the one-shot computation pads — bit-identical there
    too (zero-stuffed halos would NOT match per-layer padding);
  * all windows share one shape, so the device program compiles once;
    host memory holds the full sequence, device only W frames.

Receptive field: the WaveNet stacks dominate — 20 layers of k=3 convs
with dilations 2^(i%4) contribute sum(d_i) = 75 frames per side — plus
the quantizer ConvNeXt blocks (k=7 at T/2 and T/4: 18 frames). The
default halo of 128 frames (= 32 tokens) covers both paths with margin;
tests/test_streaming.py asserts exact equality vs the one-shot API.

`chunked_vocode` carries the same scheme through BigVGAN (the most
memory-hungry stage: 256x upsampling through 108 activations — an hour
of 24 kHz audio one-shot is a [B, 86M]-sample pass). The generator's
receptive field was MEASURED by impulse perturbation at the flagship
geometry (rates 4,4,2,2,2,2; resblock kernels 3/7/11, dilations 1/3/5;
anti-alias FIRs k=12): +-26.3 mel frames. The default halo of 40 frames
also covers the fused kernel's 16-sample exact-edges patch (<=4 frames
at the stage-0 rate) with margin. Interior windows emit only the central
chunk, so window-edge effects (replicate pads in nn/resample.py, the
Pallas edge patch) never reach the emitted region; edge windows clamp to
the true signal boundary where those edge effects are exactly the
one-shot computation's own.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_HALO_FRAMES = 128
# BigVGAN flagship receptive field is +-26.3 mel frames (measured; module
# docstring); 40 adds margin for the fused kernel's exact-edges patch.
DEFAULT_VOCODER_HALO_FRAMES = 40


def chunked_encode(
    model,
    params,
    mels: np.ndarray,
    chunk_frames: int = 1024,
    halo_frames: int = DEFAULT_HALO_FRAMES,
) -> np.ndarray:
    """mels [B, T, M] (host) -> indices [B, G*R, T'/down] (host), equal to
    one-shot `DMelCodec.encode`. T is cropped to a downsample_total
    multiple (the one-shot path's floor behaviour)."""
    from dmel_codec_tpu.models.codec import DMelCodec

    cfg = model.config
    down = cfg.downsample_total
    assert chunk_frames % down == 0 and halo_frames % down == 0
    b, t, m = np.shape(mels)
    t = (t // down) * down
    mels = np.asarray(mels[:, :t], np.float32)

    window = chunk_frames + 2 * halo_frames
    if t <= window:  # short input: one-shot
        out, _ = jax.jit(
            lambda p, x, n: model.apply({"params": p}, x, n, method=DMelCodec.encode)
        )(params, jnp.asarray(mels), jnp.full((b,), t, jnp.int32))
        return np.asarray(out)

    lengths = jnp.full((b,), window, jnp.int32)

    @jax.jit
    def encode_window(params, mel_win):
        indices, _ = model.apply(
            {"params": params}, mel_win, lengths, method=DMelCodec.encode
        )
        return indices

    chunk_t = chunk_frames // down
    pieces = []
    for start in range(0, t, chunk_frames):
        pos = min(max(start - halo_frames, 0), t - window)
        idx = np.asarray(encode_window(params, jnp.asarray(mels[:, pos : pos + window])))
        off_t = (start - pos) // down
        n_tok = min(chunk_t, (t - start) // down)
        pieces.append(idx[:, :, off_t : off_t + n_tok])
    return np.concatenate(pieces, axis=2)


def chunked_decode(
    model,
    params,
    indices: np.ndarray,
    noise: Optional[np.ndarray] = None,
    chunk_tokens: int = 256,
    halo_tokens: int = DEFAULT_HALO_FRAMES // 4,
    seed: int = 0,
) -> np.ndarray:
    """indices [B, G*R, L] (host) -> gen_mel [B, L*down, M] (host), equal
    to one-shot `DMelCodec.decode` when given the same `noise`
    ([B, L*down, concat_dim]; generated from `seed` if omitted)."""
    from dmel_codec_tpu.models.codec import DMelCodec

    cfg = model.config
    down = cfg.downsample_total
    b, c, l = np.shape(indices)
    t = l * down
    if noise is None:
        noise = np.asarray(
            jax.random.normal(
                jax.random.PRNGKey(seed), (b, t, cfg.concat_dim), jnp.float32
            )
        )
    indices = np.asarray(indices)
    noise = np.asarray(noise, np.float32)

    window = chunk_tokens + 2 * halo_tokens
    if l <= window:  # short input: one-shot
        out = jax.jit(
            lambda p, i, fl, n: model.apply(
                {"params": p}, i, fl, n, method=DMelCodec.decode
            )
        )(params, jnp.asarray(indices), jnp.full((b,), l, jnp.int32), jnp.asarray(noise))
        return np.asarray(out)

    feat_lengths = jnp.full((b,), window, jnp.int32)

    @jax.jit
    def decode_window(params, idx_win, noise_win):
        return model.apply(
            {"params": params},
            idx_win,
            feat_lengths,
            noise_win,
            method=DMelCodec.decode,
        )

    pieces = []
    for start in range(0, l, chunk_tokens):
        pos = min(max(start - halo_tokens, 0), l - window)
        idx_win = jnp.asarray(indices[:, :, pos : pos + window])
        noise_win = jnp.asarray(noise[:, pos * down : (pos + window) * down])
        mel = np.asarray(decode_window(params, idx_win, noise_win))
        off = (start - pos) * down
        n_frames = min(chunk_tokens, l - start) * down
        pieces.append(mel[:, off : off + n_frames])
    return np.concatenate(pieces, axis=1)


def chunked_vocode(
    vocoder,
    params,
    mel: np.ndarray,
    chunk_frames: int = 480,
    halo_frames: int = DEFAULT_VOCODER_HALO_FRAMES,
) -> np.ndarray:
    """mel [B, T, M] (host) -> waveform [B, T*hop_total] (host), equal to
    one-shot `BigVGAN.__call__` (module docstring: halo >= the measured
    receptive field; edge windows clamp to the signal boundary). Device
    memory is bounded by the window, not T: an hour of audio runs at the
    footprint of ~chunk_frames + 2*halo frames."""
    hop = vocoder.config.hop_total
    b, t, _ = np.shape(mel)
    mel = np.asarray(mel, np.float32)

    window = chunk_frames + 2 * halo_frames
    if t <= window:  # short input: one-shot
        return np.asarray(
            jax.jit(lambda p, x: vocoder.apply({"params": p}, x))(
                params, jnp.asarray(mel)
            )
        )

    @jax.jit
    def vocode_window(params, mel_win):
        return vocoder.apply({"params": params}, mel_win)

    pieces = []
    for start in range(0, t, chunk_frames):
        pos = min(max(start - halo_frames, 0), t - window)
        wav = np.asarray(
            vocode_window(params, jnp.asarray(mel[:, pos : pos + window]))
        )
        off = (start - pos) * hop
        n = min(chunk_frames, t - start) * hop
        pieces.append(wav[:, off : off + n])
    return np.concatenate(pieces, axis=1)
