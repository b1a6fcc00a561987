"""Honest per-pipeline-stage timing: front / mid / back on the real chip.

Tunnel-proof method (see BENCHMARKS.md): each stage repeats INSIDE one jit
via lax.fori_loop with the carry threaded through a 1e-20-scaled data
dependency (XLA cannot simplify it away, the relay cannot reorder it), and
two loop lengths are differenced so dispatch overhead cancels.

    python scripts/bench_stages.py [--batch 16] [--seconds 4]
"""

from __future__ import annotations

import argparse

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram
from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
from dmel_codec_tpu.utils.torch_compat import cast_floats

DTYPE = jnp.bfloat16


from dmel_codec_tpu.utils.profiling import timed_rep


def timed(make_dep, x0, label, audio_seconds, iters=10):
    """make_dep(carry) -> scalar f32 that must depend on the carry."""
    dt = timed_rep(make_dep, x0, iters=iters)
    print(f"{label}: {dt*1e3:.1f} ms ({audio_seconds/dt:.0f} xRT alone)", flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=int, default=4)
    args = ap.parse_args()
    batch, seconds = args.batch, args.seconds
    audio_seconds = batch * seconds

    cfg = DMelCodecConfig(compute_dtype="bfloat16")
    vcfg = BigVGANConfig(
        use_pallas_kernel=jax.devices()[0].platform == "tpu",
        pallas_exact_edges=False,
    )
    codec, vocoder = DMelCodec(config=cfg), BigVGAN(config=vcfg)
    mel_tf = LogMelSpectrogram(use_matmul_dft=True)
    samples = cfg.sample_rate * seconds
    frames = (samples // cfg.hop_length // cfg.downsample_total) * cfg.downsample_total

    rng = jax.random.PRNGKey(0)
    t = np.arange(samples) / cfg.sample_rate
    audio = jnp.asarray(
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1200 * t),
        jnp.float32,
    )[None, :].repeat(batch, 0)
    mels0 = jnp.zeros((batch, frames, cfg.n_mels))
    params = codec.init(
        rng,
        mels0,
        jnp.ones((batch, frames, 1)),
        jnp.zeros((batch, 1)),
        jnp.zeros((batch, frames, cfg.concat_dim)),
    )["params"]
    vparams = vocoder.init(jax.random.PRNGKey(1), mels0[:1, :8])["params"]
    lengths = jnp.full((batch,), frames, jnp.int32)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), (batch, frames, cfg.concat_dim), dtype=DTYPE
    )
    params = cast_floats(params, DTYPE)
    vparams = cast_floats(vparams, DTYPE)

    def front(a):
        mels = mel_tf(a)[:, :frames, :].astype(DTYPE)
        return codec.apply({"params": params}, mels, lengths, method=DMelCodec.encode)

    def mid(nz):
        return codec.apply(
            {"params": params}, indices0, il0, nz, method=DMelCodec.decode
        )

    def back(g):
        # serving path: whole-stage fused resblock groups where they win
        # (mirrors bench.py; see bigvgan_apply_fused for the A/B record)
        if jax.devices()[0].platform == "tpu":
            from dmel_codec_tpu.models.bigvgan import bigvgan_apply_fused

            return bigvgan_apply_fused(vparams, g, vcfg)
        return vocoder.apply({"params": vparams}, g)

    indices0, il0 = jax.jit(front)(audio)
    gen_mel0 = jax.jit(mid)(noise)

    t1 = timed(
        lambda a: jnp.mean(front(a)[0].astype(jnp.float32)),
        audio, "front (mel+encode+FSQ)", audio_seconds,
    )
    t2 = timed(
        lambda nz: jnp.mean(mid(nz).astype(jnp.float32)),
        noise, "mid (WaveNet decode)", audio_seconds,
    )
    t3 = timed(
        lambda g: jnp.mean(back(g).astype(jnp.float32)),
        gen_mel0, "back (BigVGAN)", audio_seconds,
    )
    total = t1 + t2 + t3
    print(f"sum: {total*1e3:.1f} ms -> xRT {audio_seconds/total:.0f}")


if __name__ == "__main__":
    main()
