"""A/B: fused channels-first AMP stage kernel vs the production unfused path.

Per-stage resblock-group time at the flagship vocoder shapes (B=16 x 4 s):
  s2 [16,12000,192], s3 [16,24000,96], s4 [16,48000,48], s5 [16,96000,24]
(s0/s1 have C >= 384 and stay on the existing composite path for now.)

    python scripts/bench_stage_fused.py [--stages 2,3,4,5] [--dtype bf16]
"""

from __future__ import annotations

import argparse
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.models.bigvgan import AMPBlock1
from dmel_codec_tpu.ops.stage_fused import (
    StageSpec,
    fused_amp_stage,
    fused_amp_stage_v2,
    pack_stage,
    stage_reference,
)
from dmel_codec_tpu.utils.profiling import timed_rep

STAGES = {  # stage -> (T, C) at B=16 x 4 s
    0: (1500, 768),
    1: (6000, 384),
    2: (12000, 192),
    3: (24000, 96),
    4: (48000, 48),
    5: (96000, 24),
}


def make_params(spec: StageSpec, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((1, 64, spec.channels))
    params = []
    for i, (k, dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
        blk = AMPBlock1(
            channels=spec.channels,
            kernel_size=k,
            dilation=tuple(dils),
            activation=spec.activation,
            logscale=spec.logscale,
        )
        params.append(blk.init(jax.random.fold_in(rng, i), x0)["params"])
    return params


def unfused_production(spec: StageSpec, params, x):
    acc = None
    for i, (k, dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
        blk = AMPBlock1(
            channels=spec.channels,
            kernel_size=k,
            dilation=tuple(dils),
            activation=spec.activation,
            logscale=spec.logscale,
            use_pallas=True,
            exact_edges=False,
        )
        y = blk.apply({"params": params[i]}, x)
        acc = y if acc is None else acc + y
    return acc / len(spec.kernel_sizes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="2,3,4,5")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--skip-prod", action="store_true")
    ap.add_argument("--impl", default="v1", choices=["v1", "v2"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    tile = args.tile or None
    impl = fused_amp_stage_v2 if args.impl == "v2" else fused_amp_stage

    for s in [int(v) for v in args.stages.split(",")]:
        t, c = STAGES[s]
        b = args.batch
        spec = StageSpec(channels=c)
        params = make_params(spec)
        packed = pack_stage(params, spec)
        packed = jax.tree_util.tree_map(jnp.asarray, packed)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t, c), jnp.float32).astype(dtype)

        # correctness on real hardware (bf16: loose tol)
        ref = stage_reference(x.astype(jnp.float32), packed, spec)
        got = impl(x, packed, spec, tile_w=tile)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        scale = float(jnp.max(jnp.abs(ref)))

        # params travel as jit ARGUMENTS through `consts` — closed-over
        # weight stacks are baked into the MLIR as constants and the
        # blockdiag s0 stacks (~300 MB at C=768) kill the remote-compile
        # helper with HTTP 413
        t_fused = timed_rep(
            lambda z, c: jnp.mean(
                impl(z, c, spec, tile_w=tile).astype(jnp.float32)
            ),
            x,
            consts=packed,
        )
        t_prod = (
            float("nan")
            if args.skip_prod
            else timed_rep(
                lambda z, c: jnp.mean(
                    unfused_production(spec, c, z).astype(jnp.float32)
                ),
                x,
                consts=params,
            )
        )
        # memory bound: one read + one write of [B,T,C] in dtype
        bytes_moved = 2 * b * t * c * x.dtype.itemsize
        bound_us = bytes_moved / 819e9 * 1e6  # v5e ~819 GB/s
        print(
            f"s{s} [{b},{t},{c}] {args.dtype}: fused {t_fused*1e3:8.3f} ms  "
            f"prod {t_prod*1e3:8.3f} ms  speedup {t_prod/t_fused:5.2f}x  "
            f"membound {bound_us/1e3:6.3f} ms ({t_fused*1e6/bound_us:4.1f}x off)  "
            f"maxerr {err:.2e} (scale {scale:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
