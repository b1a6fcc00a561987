"""Slow-fast LM autoregressive decode throughput (flagship sizes, one chip).

Reports frames/sec (each frame = 1 text token + 10 codebook tokens through
the per-frame jitted step) and the real-time factor against the codec's
23.4 Hz token rate. Random weights; compute cost is weight-independent.

    python scripts/bench_lm.py [--frames 64] [--bf16]
"""

from __future__ import annotations

import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.lm.generate import InferenceConfig, SlowFastGenerator
from dmel_codec_tpu.lm.inputs import TokenGridBuilder
from dmel_codec_tpu.models.lm import ChatMusicLM, SlowFastLMConfig
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer
from dmel_codec_tpu.utils.torch_compat import cast_floats


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument(
        "--cache-dtype",
        default=None,
        help="KV cache dtype (default: bfloat16 with --bf16 else float32)",
    )
    parser.add_argument(
        "--fast-cache",
        action="store_true",
        help="KV-cache the fast depth decode (A/B vs the fixed-shape default)",
    )
    args = parser.parse_args()

    cfg = SlowFastLMConfig()
    trainer = LMTrainer(cfg, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(0)).params
    if args.bf16:
        params = cast_floats(params, jnp.bfloat16)
    cache_dtype = args.cache_dtype or ("bfloat16" if args.bf16 else "float32")

    builder = TokenGridBuilder(config=cfg)
    text_t, audio_t = builder.build_infer_grid(
        text_ids=np.arange(10, 20, dtype=np.int64)
    )
    gen = SlowFastGenerator(
        ChatMusicLM(config=cfg),
        params,
        InferenceConfig(
            max_new_tokens=args.frames,
            max_seq_len=1024,
            cache_dtype=cache_dtype,
            fast_kv_cache=args.fast_cache,
        ),
    )

    b = args.batch
    if b == 1:
        run = lambda key: len(gen.generate(text_t, audio_t, key)[0])
    else:
        batch_text = np.stack([text_t] * b)
        batch_audio = np.stack([audio_t] * b)
        run = lambda key: sum(
            len(a) for a in gen.generate_batched(batch_text, batch_audio, key)[0]
        )

    t0 = time.perf_counter()
    n = run(jax.random.PRNGKey(1))
    compile_and_run = time.perf_counter() - t0
    print(f"first run (incl. compile): {compile_and_run:.1f}s, frames={n}")

    t0 = time.perf_counter()
    n = run(jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    fps = n / dt
    print(
        f"batch: {b}  cache: {cache_dtype}  frames (aggregate): {n}  "
        f"frames/s: {fps:.1f}  tokens/s (x11): {fps * 11:.0f}  "
        f"realtime_factor_vs_23.4Hz: {fps / 23.4375:.2f}"
    )


if __name__ == "__main__":
    main()
