"""Ablate the fused anti-alias kernel to locate its time (dev tool).

Variants, same grid/DMA structure: full kernel; no-snake (FIRs only);
no-fir (snake only, identity 'upsample' = row copy); dma-only (copy
center rows to out). Honest fori_loop differenced timing.

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
    scratch, v_e, v_o, sem, *, tile: int, variant: str
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    g = b * nt + i
    slot = jax.lax.rem(g, 2)

    def _dma(dst_slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * tile, tile + 2 * _HALO), :],
            scratch.at[dst_slot],
            sem.at[dst_slot],
        )

    @pl.when(g == 0)
    def _():
        _dma(0, b, i).start()

    @pl.when(g + 1 < pl.num_programs(0) * nt)
    def _():
        nxt_wraps = i + 1 == nt
        b2 = jnp.where(nxt_wraps, b + 1, b)
        i2 = jnp.where(nxt_wraps, 0, i + 1)
        _dma(1 - slot, b2, i2).start()

    _dma(slot, b, i).wait()
    cur = scratch.at[slot]

    if variant == "dma-only":
        for j in range(tile // _BLK):
            out_ref[0, pl.ds(j * _BLK, _BLK), :] = cur[
                pl.ds(_HALO + j * _BLK, _BLK), :
            ]
        return

    m_up = up_ref[0]
    d_e = dn_e_ref[0]
    d_o = dn_o_ref[0]
    alpha = alpha_ref[0, :].astype(jnp.float32)
    inv_beta = beta_ref[0, :].astype(jnp.float32)

    u_rows = tile + 2 * (_HALO - 8)
    n_up = (u_rows + _BLK - 1) // _BLK
    for j in range(n_up):
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
        out_ref[0, pl.ds(j * _BLK, _BLK), :] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("variant",))
def run_variant(x, a, inv_b, variant):
    b, t, c = x.shape
    tile = A._pick_tile(t, c, jnp.dtype(x.dtype).itemsize)
    n_tiles = pl.cdiv(t, tile)
    pad_tail = n_tiles * tile - t + _HALO
    xp = jnp.pad(x, ((0, 0), (_HALO, pad_tail), (0, 0)), mode="edge")
    up = jnp.asarray(A._UP_STACK, x.dtype)[None]
    dn_e = jnp.asarray(A._BANDS[2], x.dtype)[None]
    dn_o = jnp.asarray(A._BANDS[3], x.dtype)[None]
    const = lambda b_, i_: (0, 0, 0)
    return pl.pallas_call(
        partial(_kernel_v, tile=tile, variant=variant),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 2 * _BLK, _KW), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, _KW), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, _KW), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda b_, i_: (b_, i_, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 2 * _HALO, c), x.dtype),
            pltpu.VMEM((tile + 2 * (_HALO - 8), c), x.dtype),
            pltpu.VMEM((tile + 2 * (_HALO - 8), c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, up, dn_e, dn_o, a[None, :], inv_b[None, :])


def main() -> None:
    rng = np.random.default_rng(0)
    shapes = [(1, 48000, 768), (1, 12000, 192)]  # merged s4; direct s2
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
        print(f"{str(shape):<18}" + "".join(f"{r:>10.3f}" for r in row))


if __name__ == "__main__":
    main()
