"""Fused anti-aliased snake activation — Pallas TPU kernel.

TPU-native equivalent of the reference's fused CUDA kernel
(bigvgan/alias_free_activation/cuda/anti_alias_activation_cuda.cu:44-179):
replicate-pad -> 12-tap 2x upsample FIR -> snake/snakebeta -> replicate-pad
-> 12-tap 2x downsample FIR, in a single VMEM-resident pass. The unfused
composite (nn/resample.py + nn/snake.py) is the correctness oracle and the
backward path.

Derivation (polyphase, so the 2x-rate signal is never materialised in HBM):
with f = kaiser_sinc(0.5/2, 0.6/2, 12) and the reference's exact padding
(UpSample1d: replicate 5, crop 15/16; DownSample1d: replicate 5/6):

  u[2s]   = 2 * sum_{i=0..5} f[2i+1] * x[s+2-i]          (even phase)
  u[2s+1] = 2 * sum_{i=0..5} f[2i]   * x[s+3-i]          (odd phase)
  v       = snake(u)
  y[t]    = sum_{i=0..5} f[2i+1] * v_even[t+i-2]
          + sum_{i=0..5} f[2i]   * v_odd [t+i-3]

so each output tile [TT] needs input halo x[t0-6 .. t0+TT+5] — the same
+-6-tap halo the CUDA kernel keeps in its shared-memory buffer
(anti_alias_activation_cuda.cu:98-166).

Grid: (batch, time-tiles); channels ride the 128-wide lanes, time the
sublanes. The input stays in HBM/ANY and each cell DMAs its haloed slice
into a VMEM scratch (overlapping reads cannot be expressed as BlockSpecs).

The public op is differentiable: forward = this kernel, backward = VJP of
the unfused composite (the CUDA original simply raises on backward).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_codec_tpu.nn.resample import downsample1d, kaiser_sinc_filter1d, upsample1d
from dmel_codec_tpu.nn.snake import snake, snake_beta

_KS = 12


def _halo(dtype) -> int:
    """Input halo per side: 6 taps needed, rounded up to the sublane tile
    (8 for fp32, 16 for bf16) so every DMA slice / vector slice is aligned."""
    import jax.numpy as _jnp

    return 16 if _jnp.dtype(dtype).itemsize < 4 else 8
_FILT = kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, _KS)  # [12], numpy

_SNAKE_EPS = 1e-9


def _pick_tile(t: int, channels: int, align: int = 8) -> int:
    """Time-tile length: ~1 MiB per [TT, C] buffer, multiple of `align`."""
    budget = (1 << 18) // max(channels, 1)
    tt = max(align, min(2048, budget))
    tt = (tt // align) * align
    return min(tt, max(align, ((t + align - 1) // align) * align))


def _shift(arr: jnp.ndarray, k: int) -> jnp.ndarray:
    """result[j] = arr[j + k] (circular; wrapped rows fall in the halo)."""
    if k == 0:
        return arr
    return pltpu.roll(arr, (-k) % arr.shape[0], 0)


def _kernel(x_hbm, alpha_ref, beta_ref, out_ref, scratch, sem, *, tile: int, halo: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # Haloed input slice: local index j <-> global x[i*tile - halo + j].
    # Slice offset/length are multiples of the sublane tile.
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    # loads stay in the storage dtype (bandwidth); math runs in f32
    xt = scratch[:].astype(jnp.float32)  # [L, C], L = tile + 2*halo

    # Upsample phases at full length: u_even[j] = u[2s], u_odd[j] = u[2s+1]
    # for s = t0 - halo + j. Circular wrap from the rolls only pollutes rows
    # outside the ranges consumed below.
    u_even = jnp.zeros_like(xt)
    u_odd = jnp.zeros_like(xt)
    for i_tap in range(6):
        fe = float(2.0 * _FILT[2 * i_tap + 1])
        fo = float(2.0 * _FILT[2 * i_tap])
        u_even = u_even + fe * _shift(xt, 2 - i_tap)
        u_odd = u_odd + fo * _shift(xt, 3 - i_tap)

    # snake / snakebeta (alpha, 1/beta precomputed by the wrapper)
    alpha = alpha_ref[0, :].astype(jnp.float32)
    inv_beta = beta_ref[0, :].astype(jnp.float32)
    se = jnp.sin(u_even * alpha)
    so = jnp.sin(u_odd * alpha)
    v_even = u_even + inv_beta * se * se
    v_odd = u_odd + inv_beta * so * so

    # Downsample at full length, then emit the aligned [8 : 8+tile] window.
    y = jnp.zeros_like(xt)
    for i_tap in range(6):
        fe = float(_FILT[2 * i_tap + 1])
        fo = float(_FILT[2 * i_tap])
        y = y + fe * _shift(v_even, i_tap - 2)
        y = y + fo * _shift(v_odd, i_tap - 3)
    out_ref[0, :, :] = y[halo : halo + tile, :].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _fused_forward(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    inv_beta: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, c = x.shape
    halo = _halo(x.dtype)
    tile = _pick_tile(t, c, align=halo)
    n_tiles = pl.cdiv(t, tile)

    # Replicate-pad the halo; extend the tail so every tile's DMA is in
    # bounds (tail garbage lands in clipped output rows only).
    pad_tail = n_tiles * tile - t + halo
    xp = jnp.pad(x, ((0, 0), (halo, pad_tail), (0, 0)), mode="edge")

    return pl.pallas_call(
        partial(_kernel, tile=tile, halo=halo),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, c), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda b_, i_: (b_, i_, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, alpha[None, :], inv_beta[None, :])


_LANE_HALO = 128  # lane-dim slices must be 128-aligned


def _lshift(arr: jnp.ndarray, k: int) -> jnp.ndarray:
    """result[.., j] = arr[.., j + k] (circular on the lane axis)."""
    if k == 0:
        return arr
    return pltpu.roll(arr, (-k) % arr.shape[-1], 1)


def _kernel_small_c(x_hbm, alpha_ref, beta_ref, out_ref, scratch, sem, *, tile: int):
    """Transposed compute for C < 128: channels on sublanes (C % 8 == 0),
    time on lanes so the 12-tap shifts become lane rotates. Array layout
    stays [B, T, C] at the kernel boundary (a [T, C] <-> [C, T] transpose
    happens in-register) so XLA never materialises a huge-lane-dim buffer.
    Time halo is 128 per side (lane-slice alignment), amortised by the
    2048 tile."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * tile, tile + 2 * _LANE_HALO)], scratch, sem
    )
    copy.start()
    copy.wait()

    xt = scratch[:].astype(jnp.float32)  # [C, L]
    u_even = jnp.zeros_like(xt)
    u_odd = jnp.zeros_like(xt)
    for i_tap in range(6):
        fe = float(2.0 * _FILT[2 * i_tap + 1])
        fo = float(2.0 * _FILT[2 * i_tap])
        u_even = u_even + fe * _lshift(xt, 2 - i_tap)
        u_odd = u_odd + fo * _lshift(xt, 3 - i_tap)

    alpha = alpha_ref[:, 0:1].astype(jnp.float32)
    inv_beta = beta_ref[:, 0:1].astype(jnp.float32)
    se = jnp.sin(u_even * alpha)
    so = jnp.sin(u_odd * alpha)
    v_even = u_even + inv_beta * se * se
    v_odd = u_odd + inv_beta * so * so

    y = jnp.zeros_like(xt)
    for i_tap in range(6):
        fe = float(_FILT[2 * i_tap + 1])
        fo = float(_FILT[2 * i_tap])
        y = y + fe * _lshift(v_even, i_tap - 2)
        y = y + fo * _lshift(v_odd, i_tap - 3)
    out_ref[0, :, :] = y[:, _LANE_HALO : _LANE_HALO + tile].T.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _fused_forward_small_c(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    inv_beta: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, c = x.shape
    tile = 1024  # ~5 MB of f32 intermediates; 2048 brushes the 16 MB VMEM cap
    n_tiles = pl.cdiv(t, tile)
    # transposed INPUT [B, C, Tpad] (plain HBM buffer; lane-dim slices are
    # then 128-aligned); the OUTPUT stays [B, T, C] via an in-kernel
    # transpose so XLA never materialises a huge-lane-dim result in VMEM
    xp = jnp.pad(
        x, ((0, 0), (_LANE_HALO, n_tiles * tile - t + _LANE_HALO), (0, 0)), mode="edge"
    ).transpose(0, 2, 1)
    return pl.pallas_call(
        partial(_kernel_small_c, tile=tile),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((c, 1), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda b_, i_: (b_, i_, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c, tile + 2 * _LANE_HALO), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, alpha[:, None], inv_beta[:, None])


def anti_alias_activation_reference(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: Optional[jnp.ndarray],
    logscale: bool = False,
) -> jnp.ndarray:
    """Unfused oracle: UpSample1d -> snake(beta) -> DownSample1d."""
    filt = jnp.asarray(_FILT)
    u = upsample1d(x, filt, 2, _KS)
    if beta is None:
        v = snake(u, alpha, logscale)
    else:
        v = snake_beta(u, alpha, beta, logscale)
    return downsample1d(v, filt, 2, _KS)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_anti_alias_activation(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: Optional[jnp.ndarray],
    logscale: bool = False,
    interpret: bool = False,
    exact_edges: bool = True,
) -> jnp.ndarray:
    """[B, T, C] -> [B, T, C]. beta=None selects plain snake (1/alpha gain).

    Interior frames come from the fused kernel. With `exact_edges`, the
    outermost 3 frames per side are recomputed with the unfused oracle on a
    16-frame edge slice: the reference replicate-pads the *upsampled*
    signal before the downsample FIR (resample.py DownSample1d), which the
    polyphase kernel's input-side replication cannot reproduce — 3 frames
    each side is exactly the reach of the 5/6-tap downsample padding.
    `exact_edges=False` skips the patch (the kernel's input-side
    replication differs only in those 6 boundary samples per activation —
    sub-sample-scale for serving) and saves ~4 convs per instance in both
    compile time and runtime.
    """
    c = x.shape[-1]
    # Layout dispatch: C >= 128 uses the channels-on-lanes kernel (padding C
    # to a 128 multiple); 8 | C < 128 uses the transposed kernel (channels
    # on sublanes, time on lanes — shifts become lane rotates); otherwise
    # the unfused XLA path.
    small_c = c < 128
    if x.shape[1] < 32 or (small_c and c % 8 != 0):
        return anti_alias_activation_reference(x, alpha, beta, logscale)
    a = jnp.exp(alpha) if logscale else alpha
    if beta is None:
        inv_b = 1.0 / (a + _SNAKE_EPS)
    else:
        bval = jnp.exp(beta) if logscale else beta
        inv_b = 1.0 / (bval + _SNAKE_EPS)
    if small_c:  # interpret mode takes the same path (CPU test coverage)
        y = _fused_forward_small_c(x, a, inv_b, interpret=interpret)
        if exact_edges:
            head = anti_alias_activation_reference(x[:, :16, :], alpha, beta, logscale)
            tail = anti_alias_activation_reference(x[:, -16:, :], alpha, beta, logscale)
            y = y.at[:, :3, :].set(head[:, :3, :].astype(y.dtype))
            y = y.at[:, -3:, :].set(tail[:, -3:, :].astype(y.dtype))
        return y
    c_pad = (-c) % 128 if not interpret else 0
    if c_pad:
        xw = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad)))
        aw = jnp.pad(a, (0, c_pad))
        bw = jnp.pad(inv_b, (0, c_pad))
        y = _fused_forward(xw, aw, bw, interpret=interpret)[..., :c]
    else:
        y = _fused_forward(x, a, inv_b, interpret=interpret)
    if exact_edges:
        head = anti_alias_activation_reference(x[:, :16, :], alpha, beta, logscale)
        tail = anti_alias_activation_reference(x[:, -16:, :], alpha, beta, logscale)
        y = y.at[:, :3, :].set(head[:, :3, :].astype(y.dtype))
        y = y.at[:, -3:, :].set(tail[:, -3:, :].astype(y.dtype))
    return y


def _fwd(x, alpha, beta, logscale, interpret, exact_edges):
    return fused_anti_alias_activation(
        x, alpha, beta, logscale, interpret, exact_edges
    ), (
        x,
        alpha,
        beta,
    )


def _bwd(logscale, interpret, exact_edges, res, g):
    x, alpha, beta = res
    if beta is None:
        _, vjp = jax.vjp(
            lambda x_, a_: anti_alias_activation_reference(x_, a_, None, logscale),
            x,
            alpha,
        )
        dx, da = vjp(g)
        return dx, da, None
    _, vjp = jax.vjp(
        lambda x_, a_, b_: anti_alias_activation_reference(x_, a_, b_, logscale),
        x,
        alpha,
        beta,
    )
    return vjp(g)


fused_anti_alias_activation.defvjp(_fwd, _bwd)
