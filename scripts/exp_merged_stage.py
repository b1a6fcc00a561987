"""Probe the merged-stage vocoder layout hypothesis (dev tool).

TPU HBM tensors are (sublane, 128-lane) tiled, so a [B, T, C] activation
with C < 128 is physically lane-padded up to 128/C x its logical bytes.
Every op in a small-C vocoder stage (convs, adds, acts) pays that waste.
This probes, per small-C stage shape:

  add        — x + y at [B, T, C]            (padding-waste detector)
  add-m      — x + y at [1, T, B*C]          (compact layout)
  conv       — k=7 WN-style conv at [B, T, C]
  conv-m     — same conv, merged layout, feature_group_count=B, tiled kernel
  trans      — the [B,T,C] -> [1,T,B*C] -> [B,T,C] relayout pair

    python scripts/exp_merged_stage.py
"""

from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from functools import partial

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.utils.profiling import timed_rep

DTYPE = jnp.bfloat16
K = 7

SHAPES = [
    (16, 24000, 96),
    (16, 48000, 48),
    (16, 96000, 24),
]

DN = jax.lax.ConvDimensionNumbers(
    lhs_spec=(0, 2, 1), rhs_spec=(2, 1, 0), out_spec=(0, 2, 1)
)


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(K // 2, K // 2)], dimension_numbers=DN,
        feature_group_count=groups,
    )


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"{'shape':<18}{'add':>8}{'add-m':>8}{'conv':>8}{'conv-m':>9}"
          f"{'trans':>8}{'membnd':>8}   (ms)")
    for b, t, c in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, t, c)), DTYPE)
        y = jnp.asarray(rng.standard_normal((b, t, c)), DTYPE)
        xm = jnp.asarray(rng.standard_normal((1, t, b * c)), DTYPE)
        ym = jnp.asarray(rng.standard_normal((1, t, b * c)), DTYPE)
        w = jnp.asarray(rng.standard_normal((K, c, c)) * 0.05, DTYPE)
        wm = jnp.tile(w, (1, 1, b))  # [K, C, B*C] for feature_group_count=B

        def t_add(z):
            return jnp.mean((z + y).astype(jnp.float32))

        def t_add_m(z):
            return jnp.mean((z + ym).astype(jnp.float32))

        def t_conv(z):
            return jnp.mean(conv(z, w).astype(jnp.float32))

        def t_conv_m(z):
            return jnp.mean(conv(z, wm, groups=b).astype(jnp.float32))

        def t_trans(z):
            zm = z.transpose(1, 0, 2).reshape(1, t, b * c)
            back = zm.reshape(t, b, c).transpose(1, 0, 2)
            return jnp.mean(back.astype(jnp.float32))

        r = [
            timed_rep(t_add, x, iters=10),
            timed_rep(t_add_m, xm, iters=10),
            timed_rep(t_conv, x, iters=10),
            timed_rep(t_conv_m, xm, iters=10),
            timed_rep(t_trans, x, iters=10),
        ]
        mem = 3 * b * t * c * 2 / 819e9  # add: 2 reads + 1 write, compact
        print(
            f"{str((b, t, c)):<18}"
            + "".join(f"{v * 1e3:>8.3f}" for v in r[:4])
            + f"{r[4] * 1e3:>8.3f}{mem * 1e3:>8.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
