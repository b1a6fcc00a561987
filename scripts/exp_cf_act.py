"""Probe: channels-first (time-on-lanes) fused act for the small-C tail.

The public act kernel's time-on-sublanes layout needs a [B,T,C] -> [1,T,B*C]
XLA transpose pair per activation when C < 128; kernel-only time at s5 is
0.53 ms but the public op costs 2.93 ms — the transposes dominate. A
channels-first stage layout [B, C, T] (time on the 128-wide lanes, channels
on sublanes) moves only compact bytes with NO per-op transposes:

  * FIR up/down: 6-tap polyphase = lane rotates (pltpu.roll) + FMA
  * snake: per-row alpha/beta column broadcasts
  * convs: per-tap lane rotate + [C, C] matmul over sublanes (logical
    FLOPs — no kron(I_B, w) block-diagonal blowup)

This script validates the primitives and measures the single-act kernel
(s3/s4/s5 shapes) plus the XLA relayout [B,T,C] <-> [B,C,T] that a fused
stage would pay ONCE per stage instead of 18x.

    python scripts/exp_cf_act.py [--interpret]
"""

from __future__ import annotations

import argparse
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_codec_tpu.ops.anti_alias import (
    _FILT,
    _fast_sin,
    anti_alias_activation_reference,
)
from dmel_codec_tpu.utils.profiling import timed_rep

F = np.asarray(_FILT, np.float32)


def _shift(x, m):
    """x[..., t+m] on the lane axis (circular; halo absorbs the wrap)."""
    w = x.shape[-1]
    return pltpu.roll(x, shift=(-m) % w, axis=1)


def cf_act_kernel(x_ref, a_ref, ib_ref, o_ref, *, w: int, halo: int):
    """One anti-aliased snake on a [C, W] channels-first tile.

    x_ref: [C, w + 2*halo] haloed input tile (f32/bf16)
    a_ref/ib_ref: [C, 1] alpha / 1/beta columns
    o_ref: [C, w]
    Interior-tile semantics only (edges handled by caller fixups later).
    """
    x = x_ref[0, :, 0, :].astype(jnp.float32)
    a = a_ref[0].astype(jnp.float32)  # [C, 1] broadcasts over lanes
    ib = ib_ref[0].astype(jnp.float32)

    # up-even: u_e[s] = 2 sum_i f[2i+1] x[s+2-i]; up-odd: f[2i] x[s+3-i]
    u_e = jnp.zeros_like(x)
    u_o = jnp.zeros_like(x)
    shifts = {m: _shift(x, m) for m in range(-3, 4)}
    for i in range(6):
        u_e = u_e + (2.0 * F[2 * i + 1]) * shifts[2 - i]
        u_o = u_o + (2.0 * F[2 * i]) * shifts[3 - i]

    def snake(u):
        s = _fast_sin(u * a)
        return u + ib * s * s

    v_e = snake(u_e)
    v_o = snake(u_o)

    # down: y[t] = sum_i f[2i+1] v_e[t+i-2] + f[2i] v_o[t+i-3]
    y = jnp.zeros_like(x)
    for i in range(6):
        y = y + F[2 * i + 1] * _shift(v_e, i - 2) + F[2 * i] * _shift(v_o, i - 3)
    o_ref[0] = y[:, halo : halo + w].astype(o_ref.dtype)


def _windows(xp, w, halo):
    """[B, C, T+2h] -> [B, C, nt, w+2h] overlapping windows (XLA gather).

    Probe-only: the real kernel DMAs windows straight from HBM like
    ops/anti_alias.py does; this keeps the probe simple.
    """
    b, c, tp = xp.shape
    t = tp - 2 * halo
    nt = t // w
    idx = (np.arange(nt)[:, None] * w + np.arange(w + 2 * halo)[None, :]).astype(
        np.int32
    )
    return xp[:, :, idx]  # [B, C, nt, w+2h]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    interp = args.interpret or jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(0)

    # ---- correctness: interior lanes must match the oracle exactly
    b, c, t = 2, 24, 4096
    w, halo = 1024, 128
    x = rng.standard_normal((b, c, t)).astype(np.float32)
    alpha = np.exp(rng.standard_normal(c).astype(np.float32) * 0.1)
    beta = np.exp(rng.standard_normal(c).astype(np.float32) * 0.1)

    xj = jnp.asarray(x)
    a_col = jnp.asarray(alpha)[None, :, None]  # [1, C, 1] block
    ib_col = jnp.asarray(1.0 / (beta + 1e-9))[None, :, None]

    y = cf_act_windowed(xj, a_col, ib_col, w=w, halo=halo, interpret=interp)
    # oracle works channels-last
    ref = anti_alias_activation_reference(
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(alpha), jnp.asarray(beta),
        logscale=False,
    )
    ref = np.asarray(ref).transpose(0, 2, 1)
    err = np.abs(np.asarray(y) - ref)
    # ignore 8 edge samples at each end (replicate-pad semantics not in probe)
    interior = err[:, :, 16 : t - 16]
    print(f"cf act vs oracle: interior max err {interior.max():.2e} "
          f"(edges {err[:, :, :16].max():.2e}/{err[:, :, -16:].max():.2e})")
    assert interior.max() < 2e-5, "channels-first act mismatch"

    if interp:
        print("interpret-only run: correctness OK, skipping timing")
        return

    # ---- timing: per-act kernel at s3/s4/s5 channels-first shapes
    print(f"\n{'shape':<22}{'cf-act ms':>10}{'curr ms':>9}{'bound ms':>9}")
    for (bb, cc, tt), cur in [
        ((16, 96, 24064), 1.26),
        ((16, 48, 48128), 1.90),
        ((16, 24, 96256), 2.93),
    ]:
        xx = jnp.asarray(rng.standard_normal((bb, cc, tt)), jnp.bfloat16)
        aa = jnp.asarray(np.exp(rng.standard_normal(cc) * 0.1), jnp.float32)[
            None, :, None
        ]
        bbv = jnp.asarray(np.exp(rng.standard_normal(cc) * 0.1), jnp.float32)[
            None, :, None
        ]
        f = lambda xi: jnp.mean(
            cf_act_windowed(xi, aa, 1.0 / bbv, w=2048, halo=128).astype(jnp.float32)
        )
        dt = min(timed_rep(f, xx, iters=20) for _ in range(2))
        byt = 2 * bb * cc * tt * 2
        print(f"{str((bb, cc, tt)):<22}{dt*1e3:>10.3f}{cur:>9.2f}"
              f"{byt/819e9*1e3:>9.3f}")

    # ---- relayout cost: [B,T,C] <-> [B,C,T] (paid once per fused stage)
    print(f"\n{'relayout shape':<22}{'to-cf ms':>9}{'to-cl ms':>9}")
    for bb, tt, cc in [(16, 24000, 96), (16, 48000, 48), (16, 96000, 24)]:
        xcl = jnp.asarray(rng.standard_normal((bb, tt, cc)), jnp.bfloat16)
        xcf = jnp.asarray(rng.standard_normal((bb, cc, tt)), jnp.bfloat16)
        f1 = jax.jit(lambda v: v.transpose(0, 2, 1) + 0)
        g1 = lambda v: jnp.mean(f1(v).astype(jnp.float32))
        d1 = min(timed_rep(g1, xcl, iters=20) for _ in range(2))
        d2 = min(timed_rep(g1, xcf, iters=20) for _ in range(2))
        print(f"{str((bb, tt, cc)):<22}{d1*1e3:>9.3f}{d2*1e3:>9.3f}")


def cf_act_windowed(x, a_col, ib_col, w=2048, halo=128, interpret=False):
    """Wrapper: pad T to a multiple of w, run, crop."""
    b, c, t = x.shape
    tp = -(-t // w) * w
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, tp - t)), mode="edge")
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo)), mode="edge")
    xw = _windows(xp, w, halo)  # [B, C, nt, w+2h]
    nt = tp // w
    kern = partial(cf_act_kernel, w=w, halo=halo)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c, tp), x.dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(
                (1, c, 1, w + 2 * halo),
                lambda bb, i: (bb, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c, 1), lambda bb, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda bb, i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, w), lambda bb, i: (bb, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xw, a_col, ib_col)
    return y[:, :, :t]


if __name__ == "__main__":
    main()
