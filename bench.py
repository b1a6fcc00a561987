"""Headline benchmark: codec encode+decode real-time factor on one chip.

Measures the full public codec path at 24 kHz — waveform -> log-mel ->
band-WaveNet encode -> FSQ tokens -> FSQ decode -> WaveNet mel decode ->
BigVGAN vocoder -> waveform — and reports xRT (seconds of audio processed
per wall-clock second). Driver north star: xRT > 50 per TPU v5e chip
(BASELINE.md). Weights are random-init; compute cost is weight-independent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram
from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig, bigvgan_apply_fused
from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig

BASELINE_XRT = 50.0
import os
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SECONDS = 4
DTYPE = jnp.bfloat16  # serving precision (the reference casts to bf16 too)


def main() -> None:
    cfg = DMelCodecConfig(compute_dtype="bfloat16")
    vcfg = BigVGANConfig(
        use_pallas_kernel=jax.devices()[0].platform == "tpu",
        # (pallas_exact_edges is a documented no-op since the round-3 kernel
        # rewrite — the kernel computes exact replicate edges in-kernel.)
        # Merged small-C tail (block-diagonal dense convs on a [B/g,T,g*C]
        # layout) was A/B'd end-to-end and LOSES at the headline shapes
        # (187.7 vs 254.1 xRT): the per-stage refolds + g-times conv FLOPs
        # cost more than the lane-padding bytes they save once the act
        # kernel handles small C natively. Off by default; BENCH_MERGE=1
        # re-enables for A/B.
        merge_small_channels=os.environ.get("BENCH_MERGE", "0") == "1",
    )
    codec = DMelCodec(config=cfg)
    vocoder = BigVGAN(config=vcfg)
    mel_tf = LogMelSpectrogram(use_matmul_dft=True)  # MXU DFT beats XLA-TPU rfft

    samples = cfg.sample_rate * SECONDS
    frames = (samples // cfg.hop_length // cfg.downsample_total) * cfg.downsample_total

    rng = jax.random.PRNGKey(0)
    t = np.arange(samples) / cfg.sample_rate
    audio = jnp.asarray(
        (0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1200 * t)),
        dtype=jnp.float32,
    )[None, :].repeat(BATCH, 0)

    mels0 = jnp.zeros((BATCH, frames, cfg.n_mels))
    params = codec.init(
        rng,
        mels0,
        jnp.ones((BATCH, frames, 1)),
        jnp.zeros((BATCH, 1)),
        jnp.zeros((BATCH, frames, cfg.concat_dim)),
    )["params"]
    vparams = vocoder.init(jax.random.PRNGKey(1), mels0[:1, :8])["params"]
    lengths = jnp.full((BATCH,), frames, jnp.int32)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, frames, cfg.concat_dim), dtype=DTYPE
    )
    from dmel_codec_tpu.utils.torch_compat import cast_floats

    params = cast_floats(params, DTYPE)
    vparams = cast_floats(vparams, DTYPE)

    # Stage-wise jits: one fused mega-graph compiles ~5x slower for the
    # same steady-state throughput (arrays stay on device between stages).
    @jax.jit
    def front(params, audio):
        mels = mel_tf(audio)[:, :frames, :].astype(DTYPE)
        return codec.apply({"params": params}, mels, lengths, method=DMelCodec.encode)

    @jax.jit
    def mid(params, indices, idx_lengths, noise):
        return codec.apply(
            {"params": params}, indices, idx_lengths, noise, method=DMelCodec.decode
        )

    # Whole-stage fused resblock groups (ops/stage_fused v2, time-on-
    # sublanes; conv-granularity weight streaming once C > 128). Round-5
    # on-chip A/B at the headline shapes (scripts/bench_stage_fused.py,
    # fused vs per-op production, bf16):
    #   s5 [16,96000,24] 36.3 vs 99.7 ms   s4 [16,48000,48] 33.8 vs 65.9
    #   s3 [16,24000,96] 31.3 vs 46.4      s2 [16,12000,192] 45.9 vs 71.8
    #   s1 [16,6000,384] 93.5 vs 50.7 LOSES  s0 [16,1500,768] 162.0 vs 31.2 LOSES
    # s1/s0 stay per-op: at C>=384 the streamed tap re-fetches plus the
    # halo-redundant C^2 conv FLOPs cost more than the 36 HBM round trips
    # they remove. Default fuses s5..s2; BENCH_FUSE=0 reverts, BENCH_FUSE_MAX
    # re-A/Bs any cap.
    fuse_max = int(os.environ.get("BENCH_FUSE_MAX", "192"))
    use_fused_stages = (
        jax.devices()[0].platform == "tpu"
        and os.environ.get("BENCH_FUSE", "1") == "1"
    )

    @jax.jit
    def back(vparams, gen_mel):
        if use_fused_stages:
            return bigvgan_apply_fused(
                vparams, gen_mel, vcfg, fuse_max_channels=fuse_max
            )
        return vocoder.apply({"params": vparams}, gen_mel)

    @jax.jit
    def chain(audio0, out):
        # data dependency: iteration i+1's input waits on iteration i's
        # output, so the loop below cannot be reordered or elided. The
        # 1e-20 scale (not 0.0) keeps XLA's algebraic simplifier from
        # folding the dependency away, while leaving audio0 bit-identical
        # (the product underflows against |audio0| >= 1e-7).
        return audio0 + 1e-20 * jnp.mean(out).astype(jnp.float32)

    def pipeline(params, vparams, audio, noise):
        indices, idx_lengths = front(params, audio)
        gen_mel = mid(params, indices, idx_lengths, noise)
        return back(vparams, gen_mel)

    # Timing methodology: on this remote-device tunnel block_until_ready
    # can acknowledge before execution finishes, so naive dispatch loops
    # under-measure. Honest wall clock = chain every iteration through a
    # data dependency and force ONE device->host fetch at the end (the
    # fetch cannot complete until the whole chain has executed), then
    # subtract the measured fetch round-trip latency.
    out = pipeline(params, vparams, audio, noise)
    float(jnp.mean(out.astype(jnp.float32)))  # compile + warm + sync

    t0 = time.perf_counter()
    float(jnp.mean(out.astype(jnp.float32)))
    fetch_latency = time.perf_counter() - t0  # round-trip on a ready value

    n_iters = 20
    a = audio
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pipeline(params, vparams, a, noise)
        a = chain(audio, out)
    float(jnp.mean(out.astype(jnp.float32)))  # forces the full chain
    elapsed = time.perf_counter() - t0 - fetch_latency

    audio_seconds = BATCH * SECONDS * n_iters
    xrt = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "codec_encode_decode_xrt",
                "value": round(xrt, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(xrt / BASELINE_XRT, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
