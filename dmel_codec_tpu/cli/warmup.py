"""Pre-populate the persistent XLA compile cache for flagship shapes.

Cold-compiling the full serving pipeline through a remote-compile tunnel
costs minutes (BENCHMARKS.md: ~4.5 min staged, ~25 min as one fused
graph). Running this once per machine/image ahead of serving makes every
later process start hot: all graphs are AOT-lowered and compiled into
`--cache-dir`, which `bench.py` / the CLIs reuse via
jax_compilation_cache_dir.

    python -m dmel_codec_tpu.cli.warmup --cache-dir /tmp/jax_compile_cache \
        [--batches 16 4] [--seconds 4] [--lm] [--lm-batches 1 8]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="compile-cache warmup")
    parser.add_argument("--cache-dir", default="/tmp/jax_compile_cache")
    parser.add_argument("--batches", type=int, nargs="+", default=[16])
    parser.add_argument("--seconds", type=int, default=4)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--lm", action="store_true", help="also warm LM decode")
    parser.add_argument("--lm-batches", type=int, nargs="+", default=[1])
    parser.add_argument("--lm-frames", type=int, default=450)
    parser.add_argument("--lm-seq-len", type=int, default=1024)
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram
    from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
    from dmel_codec_tpu.utils.torch_compat import cast_floats

    dtype = jnp.dtype(args.dtype)
    cfg = DMelCodecConfig(
        compute_dtype=args.dtype if args.dtype != "float32" else None
    )
    vcfg = BigVGANConfig(
        use_pallas_kernel=jax.devices()[0].platform == "tpu",
        pallas_exact_edges=False,
    )
    codec = DMelCodec(config=cfg)
    vocoder = BigVGAN(config=vcfg)
    mel_tf = LogMelSpectrogram(use_matmul_dft=True)

    samples = cfg.sample_rate * args.seconds
    frames = (samples // cfg.hop_length // cfg.downsample_total) * cfg.downsample_total

    rng = jax.random.PRNGKey(0)
    mels0 = jnp.zeros((1, frames, cfg.n_mels))
    params = codec.init(
        rng,
        mels0,
        jnp.ones((1, frames, 1)),
        jnp.zeros((1, 1)),
        jnp.zeros((1, frames, cfg.concat_dim)),
    )["params"]
    vparams = vocoder.init(jax.random.PRNGKey(1), mels0[:, :8])["params"]
    if args.dtype != "float32":
        params = cast_floats(params, dtype)
        vparams = cast_floats(vparams, dtype)

    def codec_stages(batch: int):
        lengths = jnp.full((batch,), frames, jnp.int32)
        l = frames // cfg.downsample_total

        @jax.jit
        def front(params, audio):
            mels = mel_tf(audio)[:, :frames, :].astype(dtype)
            return codec.apply(
                {"params": params}, mels, lengths, method=DMelCodec.encode
            )

        @jax.jit
        def mid(params, indices, idx_lengths, noise):
            return codec.apply(
                {"params": params}, indices, idx_lengths, noise, method=DMelCodec.decode
            )

        @jax.jit
        def back(vparams, gen_mel):
            return vocoder.apply({"params": vparams}, gen_mel)

        audio_s = jax.ShapeDtypeStruct((batch, samples), jnp.float32)
        idx_s = jax.ShapeDtypeStruct((batch, cfg.num_codebook_rows, l), jnp.int32)
        len_s = jax.ShapeDtypeStruct((batch,), jnp.int32)
        noise_s = jax.ShapeDtypeStruct((batch, frames, cfg.concat_dim), dtype)
        mel_s = jax.ShapeDtypeStruct((batch, frames, cfg.n_mels), dtype)
        return [
            ("encode", front, (params, audio_s)),
            ("decode", mid, (params, idx_s, len_s, noise_s)),
            ("vocoder", back, (vparams, mel_s)),
        ]

    jobs = []
    for b in args.batches:
        for name, fn, shapes in codec_stages(b):
            jobs.append((f"codec/{name}[B={b}]", fn, shapes))

    if args.lm:
        from dmel_codec_tpu.lm.generate import InferenceConfig, SlowFastGenerator
        from dmel_codec_tpu.lm.inputs import TokenGridBuilder
        from dmel_codec_tpu.models.lm import ChatMusicLM, SlowFastLMConfig
        from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer

        lm_cfg = SlowFastLMConfig()
        lm_params = LMTrainer(lm_cfg, LMTrainConfig()).init_state(
            jax.random.PRNGKey(2)
        ).params
        if args.dtype != "float32":
            lm_params = cast_floats(lm_params, dtype)
        gen = SlowFastGenerator(
            ChatMusicLM(config=lm_cfg),
            lm_params,
            InferenceConfig(
                max_new_tokens=args.lm_frames,
                max_seq_len=args.lm_seq_len,
                cache_dtype=args.dtype,
            ),
        )
        import numpy as np

        builder = TokenGridBuilder(config=lm_cfg)
        text_t, audio_t = builder.build_infer_grid(
            text_ids=np.arange(10, 20, dtype=np.int64)
        )
        for b in args.lm_batches:
            # generation graphs are exercised (not just lowered): the
            # while_loop body + prefill compile on first call
            def run_lm(b=b):
                if b == 1:
                    gen.generate(text_t, audio_t, jax.random.PRNGKey(3))
                else:
                    gen.generate_batched(
                        np.stack([text_t] * b),
                        np.stack([audio_t] * b),
                        jax.random.PRNGKey(3),
                    )

            jobs.append((f"lm/generate[B={b}]", run_lm, None))

    total0 = time.perf_counter()
    for name, fn, shapes in jobs:
        t0 = time.perf_counter()
        if shapes is None:
            fn()
        else:
            fn.lower(*shapes).compile()
        print(f"warmed {name}: {time.perf_counter() - t0:.1f}s")
    print(
        f"compile cache at {args.cache_dir} warmed in "
        f"{time.perf_counter() - total0:.1f}s"
    )


if __name__ == "__main__":
    main()
