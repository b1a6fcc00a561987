"""Honest per-op timing of the anti-aliased snake activation variants.

Tunnel-proof method: repeat the op N times INSIDE one jit via lax.fori_loop
(the op is shape-preserving, so the loop carry chains executions on-device)
and difference two loop lengths — per-dispatch/tunnel overhead cancels.

    python scripts/bench_act.py
"""

from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from functools import partial

from dmel_codec_tpu.ops.anti_alias import (
    anti_alias_activation_reference,
    fused_anti_alias_activation,
)

DTYPE = jnp.bfloat16
N_LO, N_HI = 2, 12

# one act input shape per vocoder stage (B=16, 4 s clips)
SHAPES = [
    (16, 1500, 768),
    (16, 6000, 384),
    (16, 12000, 192),
    (16, 24000, 96),
    (16, 48000, 48),
    (16, 96000, 24),
]


from dmel_codec_tpu.utils.profiling import timed_rep as _timed_rep


def timed_rep(op, x, alpha, beta):
    """Seconds per op execution, overhead-cancelled (utils/profiling)."""
    return _timed_rep(
        lambda y: jnp.mean(op(y, alpha, beta).astype(jnp.float32)),
        x,
        iters=N_HI - N_LO,
    )


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"{'shape':<20}{'fused ms':>10}{'unfused ms':>12}{'speedup':>9}"
          f"{'mem-bound ms':>14}")
    for shape in SHAPES:
        b, t, c = shape
        x = jnp.asarray(rng.standard_normal(shape), DTYPE)
        alpha = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

        fused = partial(
            fused_anti_alias_activation,
            logscale=True,
            interpret=False,
            exact_edges=False,
        )
        dt_f = timed_rep(lambda y, a, bb: fused(y, a, bb), x, alpha, beta)
        dt_u = timed_rep(
            lambda y, a, bb: anti_alias_activation_reference(
                y, a, bb, logscale=True
            ).astype(y.dtype),
            x,
            alpha,
            beta,
        )
        mem_ms = 2 * b * t * c * x.dtype.itemsize / 819e9 * 1e3
        print(
            f"{str(shape):<20}{dt_f*1e3:>10.2f}{dt_u*1e3:>12.2f}"
            f"{dt_u/dt_f:>9.2f}{mem_ms:>14.3f}"
        )


if __name__ == "__main__":
    main()
