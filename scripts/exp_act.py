"""Kernel-variant A/B for the fused anti-alias activation (dev tool).

Times, per vocoder stage shape: the XLA composite vs the Pallas kernel
(the default dispatch), honestly via the chained fori_loop harness.

    python scripts/exp_act.py
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

SHAPES = [
    (16, 1500, 768),
    (16, 6000, 384),
    (16, 12000, 192),
    (16, 24000, 96),
    (16, 48000, 48),
    (16, 96000, 24),
]


def force_kernel(x, a, inv_b):
    # default dispatch IS the kernel now (in-kernel merge, no transposes);
    # alpha/beta given in linear scale, beta = 1/inv_b
    return A.fused_anti_alias_activation(x, a, 1.0 / inv_b, False)


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"{'shape':<18}{'composite':>10}{'kernel':>10}{'membound':>10}  (ms)")
    for shape in SHAPES:
        b, t, c = shape
        x = jnp.asarray(rng.standard_normal(shape), DTYPE)
        a = jnp.asarray(np.exp(rng.standard_normal(c) * 0.1), jnp.float32)
        inv_b = 1.0 / (a + 1e-9)

        dt_c = timed_rep(
            lambda y: jnp.mean(A._fast_composite(y, a, inv_b).astype(jnp.float32)),
            x, iters=10,
        )
        dt_k = timed_rep(
            lambda y: jnp.mean(force_kernel(y, a, inv_b).astype(jnp.float32)),
            x, iters=10,
        )
        mem = 2 * b * t * c * x.dtype.itemsize / 819e9 * 1e3
        print(f"{str(shape):<18}{dt_c*1e3:>10.3f}{dt_k*1e3:>10.3f}{mem:>10.3f}")


if __name__ == "__main__":
    main()
