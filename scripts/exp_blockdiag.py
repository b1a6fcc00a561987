"""Probe: dense block-diagonal convs in the folded small-C layout (dev tool).

The merged-stage probe (exp_merged_stage.py) showed XLA's grouped conv
(feature_group_count=G) is 5-8x slower than dense at vocoder tail shapes.
This probes the alternative: fold g batches into lanes ([B,T,C] ->
[B/g, T, g*C], g*C = 384) and run the grouped conv as a DENSE conv whose
kernel is the block-diagonal expansion kron(I_g, w) — the MXU does g x the
logical FLOPs but every byte moved is real and the contraction is 384 wide.

Per tail stage shape and kernel size: dense unmerged (current path),
blockdiag folded, and the fold/unfold relayout costs.

    python scripts/exp_blockdiag.py
"""

from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.utils.profiling import timed_rep

DTYPE = jnp.bfloat16
DN = ("NWC", "WIO", "NWC")

# (B, T, C, g): fold g lifts lanes to a 128-lane multiple
SHAPES = [
    (16, 12000, 192, 2),
    (16, 24000, 96, 4),
    (16, 48000, 48, 8),
    (16, 96000, 24, 16),
]
KS = [3, 7, 11]


def conv(x, w, d=1):
    k = w.shape[0]
    p = (k * d - d) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(p, p)], rhs_dilation=(d,), dimension_numbers=DN
    )


def fold(x, g):
    b, t, c = x.shape
    return x.reshape(b // g, g, t, c).transpose(0, 2, 1, 3).reshape(b // g, t, g * c)


def unfold(x, g):
    bg, t, gc = x.shape
    c = gc // g
    return x.reshape(bg, t, g, c).transpose(0, 2, 1, 3).reshape(bg * g, t, c)


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"{'case':<26}{'dense ms':>10}{'blockdiag ms':>14}{'fold ms':>9}{'unfold ms':>11}")
    for b, t, c, g in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, t, c)), DTYPE)
        xf = jax.jit(lambda y: fold(y, g))(x)
        dt_fold = timed_rep(
            lambda y: jnp.mean(fold(y, g).astype(jnp.float32)), x, iters=20
        )
        dt_unfold = timed_rep(
            lambda y: jnp.mean(unfold(y, g).astype(jnp.float32)), xf, iters=20
        )
        for k in KS:
            w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, DTYPE)
            wbd = jax.vmap(lambda wk: jnp.kron(jnp.eye(g, dtype=DTYPE), wk))(w)
            dt_dense = timed_rep(
                lambda y: jnp.mean(conv(y, w).astype(jnp.float32)), x, iters=20
            )
            dt_bd = timed_rep(
                lambda y: jnp.mean(conv(y, wbd).astype(jnp.float32)), xf, iters=20
            )
            print(
                f"C={c:<4}k={k:<3}T={t:<7}"
                f"{dt_dense*1e3:>10.3f}{dt_bd*1e3:>14.3f}"
                f"{dt_fold*1e3:>9.3f}{dt_unfold*1e3:>11.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
