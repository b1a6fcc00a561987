"""Per-stage BigVGAN timing on the real chip: where do the ~145 ms go?

Times each upsample stage (transposed conv + its 3 AMP resblocks) as a
standalone jitted fn at serving shapes/dtype, plus conv_pre/conv_post.
Run AFTER bench.py so the compile cache is warm-ish.

    python scripts/profile_vocoder.py [--batch 4] [--seconds 4]
"""

from __future__ import annotations

import argparse

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.models.bigvgan import (
    AMPBlock1,
    BigVGANConfig,
    WNConv,
    WNConvTranspose1d,
)

DTYPE = jnp.bfloat16


from dmel_codec_tpu.utils.profiling import timed_rep


def bench_fn(fn, p, x, iters=20):
    """Honest timing on the remote-device tunnel (utils/profiling.timed_rep)."""
    return timed_rep(
        lambda xi: jnp.mean(fn(p, xi).astype(jnp.float32)), x, iters=iters
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    cfg = BigVGANConfig(
        use_pallas_kernel=jax.devices()[0].platform == "tpu",
        pallas_exact_edges=False,
    )
    b = args.batch
    t_mel = args.seconds * 24000 // 256  # 1500 per 16 s? no: frames per clip
    rng = np.random.default_rng(0)

    total = 0.0
    rows = []

    # conv_pre: [B, T_mel, 100] -> 1536
    x = jnp.asarray(rng.standard_normal((b, t_mel, cfg.num_mels)), DTYPE)
    m = WNConv(cfg.upsample_initial_channel, kernel_size=(7,), padding=3)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    p = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), p)
    dt = bench_fn(jax.jit(lambda p, x: m.apply({"params": p}, x)), p, x, iters=args.iters)
    rows.append(("conv_pre", x.shape, dt))
    print(f"  conv_pre: {dt*1e3:.2f} ms", flush=True)
    total += dt

    t = t_mel
    ch_in = cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        x = jnp.asarray(rng.standard_normal((b, t, ch_in)), DTYPE)
        up = WNConvTranspose1d(ch, kernel_size=k, stride=u, padding=(k - u) // 2)
        pu = up.init(jax.random.PRNGKey(i), x)["params"]
        pu = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), pu)
        dt_up = bench_fn(
            jax.jit(lambda p, x: up.apply({"params": p}, x)), pu, x, iters=args.iters
        )
        t *= u
        total += dt_up
        rows.append((f"up_{i} (x{u} {ch_in}->{ch})", x.shape, dt_up))
        print(f"  up_{i}: {dt_up*1e3:.2f} ms", flush=True)

        y = jnp.asarray(rng.standard_normal((b, t, ch)), DTYPE)
        dt_blocks = 0.0
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            blk = AMPBlock1(
                channels=ch,
                kernel_size=rk,
                dilation=tuple(rd),
                activation=cfg.activation,
                logscale=cfg.snake_logscale,
                use_pallas=cfg.use_pallas_kernel,
                exact_edges=cfg.pallas_exact_edges,
            )
            pb = blk.init(jax.random.PRNGKey(i * 10 + rk), y)["params"]
            pb = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), pb)
            dt_b = bench_fn(
                jax.jit(lambda p, x: blk.apply({"params": p}, x)), pb, y, iters=args.iters
            )
            dt_blocks += dt_b
        total += dt_blocks
        rows.append((f"resblocks_{i} (C={ch}, T={t})", y.shape, dt_blocks))
        print(f"  resblocks_{i}: {dt_blocks*1e3:.2f} ms", flush=True)
        ch_in = ch

    # conv_post: [B, T, 24] -> 1 (wn, k=7)
    x = jnp.asarray(rng.standard_normal((b, t, ch_in)), DTYPE)
    post = WNConv(1, kernel_size=(7,), padding=3, use_bias=cfg.use_bias_at_final)
    pp = post.init(jax.random.PRNGKey(99), x)["params"]
    pp = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), pp)
    dt = bench_fn(jax.jit(lambda p, x: post.apply({"params": p}, x)), pp, x, iters=args.iters)
    rows.append(("conv_post", x.shape, dt))
    total += dt

    audio_s = b * args.seconds
    print(f"\n{'stage':<34}{'input shape':<22}{'ms':>8}{'% total':>9}")
    for name, shape, dt in rows:
        print(f"{name:<34}{str(tuple(shape)):<22}{dt*1e3:>8.2f}{100*dt/total:>8.1f}%")
    print(f"\nsum of stages: {total*1e3:.1f} ms for {audio_s} s audio "
          f"(vocoder-only xRT {audio_s/total:.0f})")


if __name__ == "__main__":
    main()
