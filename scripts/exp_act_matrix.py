"""Autotune matrix for the fused act kernel (dev tool).

Times _fused_forward (kernel only — merge transposes excluded) over
{sequential, pipelined} x {nseg=1, planned nseg} per vocoder stage shape.
The winners are baked into _pick_pipelined / _plan_segments.

    python scripts/exp_act_matrix.py
"""

from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.ops import anti_alias as A
from dmel_codec_tpu.utils.profiling import timed_rep

DTYPE = jnp.bfloat16

# (kernel-facing shape, label): s0-s2 direct (lanes pre-padded to the
# 128-multiple the public op would pass), s3-s5 lane-merged
CASES = [
    ((16, 1500, 768), "s0 direct"),
    ((16, 6000, 384), "s1 direct"),
    ((16, 12000, 256), "s2 direct"),  # C=192 padded
    ((1, 24000, 1536), "s3 merged"),
    ((1, 48000, 768), "s4 merged"),
    ((1, 96000, 384), "s5 merged"),
]


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"{'case':<22}{'seq/1':>8}{'pipe/1':>8}{'seq/seg':>9}{'pipe/seg':>9}   (ms)")
    for shape, label in CASES:
        b, t, lanes = shape
        x = jnp.asarray(rng.standard_normal(shape), DTYPE)
        a = jnp.asarray(np.exp(rng.standard_normal(lanes) * 0.1), jnp.float32)[None]
        ib = 1.0 / a
        nseg = A._plan_segments(b, t, lanes, 2)
        cols = []
        for ns in (1, nseg):
            for pipe in (False, True):
                if ns == 1 and nseg == 1 and len(cols) >= 2:
                    cols.append(float("nan"))
                    continue
                f = lambda y, p=pipe, n=ns: jnp.mean(
                    A._fused_forward(y, a, ib, False, p, n).astype(jnp.float32)
                )
                dt = min(timed_rep(f, x, iters=20) for _ in range(2))
                cols.append(dt * 1e3)
        # order printed: seq/1, pipe/1, seq/seg, pipe/seg
        o = [cols[0], cols[1], cols[2], cols[3]]
        print(
            f"{label:<22}" + "".join(f"{v:>8.3f}" if v == v else f"{'-':>8}" for v in o)
            + f"   nseg={nseg}",
            flush=True,
        )


if __name__ == "__main__":
    main()
