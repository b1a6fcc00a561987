"""Break the B=1 LM frame step into timed pieces (VERDICT r2 Weak #3).

Times each component of one AR frame with the in-jit fori_loop
differencing harness (tunnel-proof; see utils/profiling.timed_rep — the
callback maps the loop carry to a scalar dep; the harness rebuilds the
next carry from it, so every repeat truly executes):
  * slow decoder cached step (24L, 896h, cache 1024) with/without head
  * exact top-k sampling over the 151936 text vocab
  * one fast depth forward (12L, 480h, seq 11)
  * audio sampling (top-k 50 over 1800 + penalty window)
  * embed_inputs for one token

    python scripts/profile_lm_frame.py [--fp32]
"""

from __future__ import annotations

import argparse

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.lm.sampling import sample_token
from dmel_codec_tpu.models.lm import ChatMusicLM, SlowFastLMConfig
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer
from dmel_codec_tpu.utils.profiling import timed_rep
from dmel_codec_tpu.utils.torch_compat import cast_floats


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fp32", action="store_true")
    args = parser.parse_args()

    cfg = SlowFastLMConfig()
    model = ChatMusicLM(config=cfg)
    trainer = LMTrainer(cfg, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(0)).params
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    params = cast_floats(params, dtype)
    cache = model.init_slow_cache(1, 1024, dtype=dtype)
    # params/cache travel as jit ARGUMENTS through timed_rep's `consts` —
    # closing over them bakes ~1 GB of constants into the MLIR and kills
    # the remote-compile helper (see utils/profiling.timed_rep)
    consts = {"p": params, "c": cache}

    h = jnp.zeros((1, 1, cfg.slow.hidden_size), dtype)
    rows = {}

    def row(name, seconds):
        rows[name] = seconds * 1e3
        print(f"{name:<44}{seconds * 1e3:8.3f} ms", flush=True)

    def scalar(x):
        return jnp.mean(x.astype(jnp.float32))

    # --- slow cached step -------------------------------------------------
    def slow_with_head(x, k):
        logits, hidden, _ = model.apply(
            {"params": k["p"]}, x, k["c"], method=ChatMusicLM.forward_generate_text
        )
        return scalar(logits) + scalar(hidden)

    def slow_decoder_only(x, k):
        hidden, _ = model.apply(
            {"params": k["p"]}, x, k["c"],
            method=lambda m, e, c: m.slow_decoder(e, cache=c),
        )
        return scalar(hidden)

    row("slow step incl. text head",
        timed_rep(slow_with_head, h, iters=20, consts=consts))
    row("slow decoder only (no head)",
        timed_rep(slow_decoder_only, h, iters=20, consts=consts))

    # --- text sampling: exact top-50 over 151936 --------------------------
    logits_t = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.slow.vocab_size,), jnp.float32
    )

    def sample_text(l):
        tok, _ = sample_token(jax.random.PRNGKey(2), l, None, None, 0.7, 50, 0.8)
        return tok.astype(jnp.float32)

    row("text sample (top-k over 151936)", timed_rep(sample_text, logits_t, iters=20))

    def topk_only(l):
        vals, _ = jax.lax.top_k(l, 50)
        return jnp.mean(vals)

    row("  lax.top_k(151936, 50) alone", timed_rep(topk_only, logits_t, iters=20))

    # --- one fast depth forward (seq 11) ----------------------------------
    ids = jnp.zeros((1, cfg.audio_codebook_count), jnp.int32)

    def fast_fwd(x, k):
        logits = model.apply(
            {"params": k["p"]}, x, ids,
            method=ChatMusicLM.forward_generate_audio_fixed,
        )
        return scalar(logits)

    row("one fast depth forward (12L, seq 11)",
        timed_rep(fast_fwd, h, iters=20, consts=consts))

    # --- audio sampling ----------------------------------------------------
    logits_a = jax.random.normal(jax.random.PRNGKey(3), (cfg.audio_vocab,), jnp.float32)
    win = jnp.zeros((16,), jnp.int32)
    winv = jnp.ones((16,), bool)

    def sample_audio(l):
        tok, _ = sample_token(jax.random.PRNGKey(4), l, win, winv, 0.7, 50, 0.8, 1.2)
        return tok.astype(jnp.float32)

    row("audio sample (top-k 1800 + penalty)", timed_rep(sample_audio, logits_a, iters=20))

    # --- embed_inputs for one token ----------------------------------------
    tid = jnp.zeros((1, 1), jnp.int32)
    aid = jnp.zeros((1, 1, cfg.audio_codebook_count), jnp.int32)

    def embed(x, k):
        e = model.apply(
            {"params": k["p"]}, tid, aid, method=ChatMusicLM.embed_inputs
        )
        return scalar(e) + scalar(x)

    row("embed_inputs (1 token)", timed_rep(embed, h, iters=20, consts=consts))

    total = (
        rows["slow step incl. text head"]
        + rows["text sample (top-k over 151936)"]
        + 10 * rows["one fast depth forward (12L, seq 11)"]
        + 10 * rows["audio sample (top-k 1800 + penalty)"]
        + rows["embed_inputs (1 token)"]
    )
    print("-" * 56)
    print(f"{'component sum for one frame':<44}{total:8.3f} ms "
          f"({1e3 / total:.0f} frames/s)")


if __name__ == "__main__":
    main()
