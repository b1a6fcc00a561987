"""Ablate the fused anti-alias kernel to locate its time (dev tool).

Variants sharing the production kernel's grid/DMA structure (clamped
window DMAs, double-buffered in/out, no XLA pad):
  dma-only  — copy the window's center rows to the output (pure traffic)
  no-snake  — FIR matmuls only (up + down, no VPU nonlinearity)
  no-fir    — snake only (phase duplication by row copy, no matmuls)
  full      — the real kernel body
Honest fori_loop differenced timing.

    python scripts/exp_act_variants.py
"""

from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from functools import partial

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_codec_tpu.ops import anti_alias as A
from dmel_codec_tpu.utils.profiling import timed_rep

DTYPE = jnp.bfloat16
_HALO, _BLK, _KW = A._HALO, A._BLK, A._KW


def _kernel_v(
    x_hbm, up_ref, dn_e_ref, dn_o_ref, alpha_ref, beta_ref, out_ref,
    scratch, v_e, v_o, y_buf, in_sem, out_sem,
    *, tile: int, t: int, nt: int, variant: str,
):
    bg = pl.program_id(0)
    i = pl.program_id(1)
    g = bg * nt + i
    ncells = x_hbm.shape[0] * nt
    slot = jax.lax.rem(g, 2)
    lanes = scratch.shape[-1]

    def _in_copy(sl, bb, src_lo, rows, dst_lo):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(src_lo, rows), :],
            scratch.at[sl, pl.ds(dst_lo, rows), :],
            in_sem.at[sl],
        )

    # benchmark shapes divide evenly and are long; use head/mid/last as in
    # the production kernel (single-tile case not exercised here)
    def start_in(sl, bb, ii):
        @pl.when(ii == 0)
        def _():
            _in_copy(sl, bb, 0, tile + _HALO, _HALO).start()

        @pl.when(jnp.logical_and(ii > 0, ii < nt - 1))
        def _():
            lo = pl.multiple_of(ii * tile - _HALO, _HALO)
            _in_copy(sl, bb, lo, tile + 2 * _HALO, 0).start()

        @pl.when(ii == nt - 1)
        def _():
            _in_copy(sl, bb, t - (tile + _HALO), tile + _HALO, 0).start()

    @pl.when(g == 0)
    def _():
        start_in(slot, bg, i)

    @pl.when(g + 1 < ncells)
    def _():
        wraps = i + 1 == nt
        start_in(1 - slot, jnp.where(wraps, bg + 1, bg), jnp.where(wraps, 0, i + 1))

    @pl.when(i == 0)
    def _():
        _in_copy(slot, bg, 0, tile + _HALO, _HALO).wait()

    @pl.when(jnp.logical_and(i > 0, i < nt - 1))
    def _():
        lo = pl.multiple_of(i * tile - _HALO, _HALO)
        _in_copy(slot, bg, lo, tile + 2 * _HALO, 0).wait()

    @pl.when(i == nt - 1)
    def _():
        _in_copy(slot, bg, t - (tile + _HALO), tile + _HALO, 0).wait()

    cur = scratch.at[slot]
    o = pl.multiple_of(jnp.where(i == nt - 1, t - tile, i * tile), _HALO)

    def _out_copy(sl, bb, oo):
        return pltpu.make_async_copy(
            y_buf.at[sl, pl.ds(0, tile), :],
            out_ref.at[bb, pl.ds(oo, tile), :],
            out_sem.at[sl],
        )

    if ncells > 2:

        @pl.when(g >= 2)
        def _():
            _out_copy(slot, bg, o).wait()

    if variant == "dma-only":
        for j in range(tile // _BLK):
            y_buf[slot, pl.ds(j * _BLK, _BLK), :] = cur[
                pl.ds(_HALO + j * _BLK, _BLK), :
            ]
    else:
        m_up = up_ref[0]
        alpha = alpha_ref[0, :].astype(jnp.float32)
        inv_beta = beta_ref[0, :].astype(jnp.float32)
        u_rows = tile + 2 * (_HALO - 8)
        for j in range((u_rows + _BLK - 1) // _BLK):
            s = min(8 + j * _BLK, 8 + u_rows - _BLK)
            if variant == "no-fir":
                xin = cur[pl.ds(s, _BLK), :].astype(jnp.float32)
                u = jnp.concatenate([xin, xin], axis=0)
            else:
                u = jnp.dot(
                    m_up, cur[pl.ds(s - 8, _KW), :],
                    preferred_element_type=jnp.float32,
                )
            if variant == "no-snake":
                v = u
            else:
                sn = A._fast_sin(u * alpha)
                v = u + inv_beta * sn * sn
            v_e[pl.ds(s - 8, _BLK), :] = v[:_BLK].astype(v_e.dtype)
            v_o[pl.ds(s - 8, _BLK), :] = v[_BLK:].astype(v_o.dtype)

        d_e = dn_e_ref[0]
        d_o = dn_o_ref[0]
        for j in range(tile // _BLK):
            if variant == "no-fir":
                y = (
                    v_e[pl.ds(j * _BLK + 8, _BLK), :].astype(jnp.float32)
                    + v_o[pl.ds(j * _BLK + 8, _BLK), :].astype(jnp.float32)
                ) * 0.5
            else:
                y = jnp.dot(
                    d_e, v_e[pl.ds(j * _BLK, _KW), :],
                    preferred_element_type=jnp.float32,
                ) + jnp.dot(
                    d_o, v_o[pl.ds(j * _BLK, _KW), :],
                    preferred_element_type=jnp.float32,
                )
            y_buf[slot, pl.ds(j * _BLK, _BLK), :] = y.astype(y_buf.dtype)

    _out_copy(slot, bg, o).start()

    @pl.when(g == ncells - 1)
    def _():
        _out_copy(slot, bg, o).wait()
        if ncells >= 2:
            _out_copy(1 - slot, bg, o).wait()


@partial(jax.jit, static_argnames=("variant",))
def run_variant(x, a, inv_b, variant):
    b, t, lanes = x.shape
    tile = A._plan_tile(t, lanes, jnp.dtype(x.dtype).itemsize)
    nt = pl.cdiv(t, tile)
    assert nt > 1, "ablation shapes must be multi-tile"
    up = jnp.asarray(A._UP_STACK, x.dtype)[None]
    dn_e = jnp.asarray(A._BANDS[2], x.dtype)[None]
    dn_o = jnp.asarray(A._BANDS[3], x.dtype)[None]
    const = lambda b_, i_: (0, 0, 0)
    return pl.pallas_call(
        partial(_kernel_v, tile=tile, t=t, nt=nt, variant=variant),
        out_shape=jax.ShapeDtypeStruct((b, t, lanes), x.dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 2 * _BLK, _KW), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, _KW), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, _KW), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 2 * _HALO, lanes), x.dtype),
            pltpu.VMEM((tile + 2 * (_HALO - 8), lanes), x.dtype),
            pltpu.VMEM((tile + 2 * (_HALO - 8), lanes), x.dtype),
            pltpu.VMEM((2, tile, lanes), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x, up, dn_e, dn_o, a[None], inv_b[None])


def main() -> None:
    rng = np.random.default_rng(0)
    # merged s5 (lanes 384 over long T) and direct s1 (C=384, B=16)
    shapes = [(1, 96000, 384), (16, 6000, 384)]
    variants = ["dma-only", "no-fir", "no-snake", "full"]
    print(f"{'shape':<18}" + "".join(f"{v:>10}" for v in variants) + "   (ms)")
    for shape in shapes:
        b, t, c = shape
        x = jnp.asarray(rng.standard_normal(shape), DTYPE)
        a = jnp.asarray(np.exp(rng.standard_normal(c) * 0.1), jnp.float32)
        inv_b = 1.0 / a
        row = []
        for v in variants:
            dt = timed_rep(
                lambda y, vv=v: jnp.mean(
                    run_variant(y, a, inv_b, vv).astype(jnp.float32)
                ),
                x, iters=10,
            )
            row.append(dt * 1e3)
        print(f"{str(shape):<18}" + "".join(f"{r:>10.3f}" for r in row), flush=True)


if __name__ == "__main__":
    main()
