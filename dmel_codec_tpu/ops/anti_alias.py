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

so each output tile [TT] needs input halo x[t0-6 .. t0+TT+5].

MXU formulation: the four 6-tap FIRs are compile-time-constant BANDED
matrices, applied to 112-row blocks as [112, 128] x [128, L] matmuls
(block-banded Toeplitz). The FLOP overhead of the dense band is far
cheaper than per-tap VPU shift+FMA passes: the systolic array runs them at
>100 TFLOP/s while a roll-based formulation is VPU-issue-bound. Only the
snake itself (polynomial sin, multiply-add) runs on the VPU.

HBM traffic (vs what the round-2 kernel still paid):
  * no `jnp.pad` before the kernel — each grid cell DMAs a clamped window
    straight out of the unpadded input and replicates the edge rows inside
    VMEM (an XLA pad is a full extra HBM round trip, which alone exceeds
    this op's entire memory bound);
  * outputs leave through async DMAs from a double-buffered VMEM tile, so
    the store overlaps the next tile's compute;
  * C < 128 inputs are merged into the lanes as [B, T, C] -> [1, T, B*C]
    by an XLA transpose each way. TPU HBM tensors are (sublane, 128-lane)
    tiled, so a C < 128 array is physically lane-padded — the transpose
    pays one relayout but every byte the kernel then moves is real.
    (Mosaic rejects DMA windows whose lane slices are not 128-aligned, so
    the merge cannot be done with per-batch DMAs.)

Edge exactness: the reference replicate-pads the *upsampled* signal before
the downsample FIR (resample.py DownSample1d, pad 5/6). In polyphase terms
that sets v_e[-1..-2] = v_o[-1..-3] = v_e[0] at the head and
v_e[T..T+2] = v_o[T..T+2] = v_o[T-1] at the tail — six row writes on the
in-VMEM snake buffers of the first/last tile. The kernel applies them
directly, so its output is bit-for-bit the reference semantics at the
edges too (the round-2 kernel needed a post-hoc 3-frame patch that cost
two full-tensor dynamic-update-slices per activation).

Layout: time on sublanes, channels on the 128-wide lanes. Grid:
(batch, time-tiles); for merged small-C stages the batch axis collapses
into the lanes and the grid is (1, time-tiles).

The public op is differentiable: forward = this kernel, backward = VJP of
the unfused composite (the CUDA original simply raises on backward).
"""

from __future__ import annotations

import os
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
_FILT = kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, _KS)  # [12], numpy

_SNAKE_EPS = 1e-9

_HALO = 16  # input halo per side: >= 6 taps, sublane-aligned for f32 + bf16
# FIR block rows (matmul M dim). 112 makes the contraction width _KW
# exactly one 128-lane MXU tile. Env knob for A/B experiments.
_BLK = int(os.environ.get("DMEL_AA_BLK", "112"))
_KW = _BLK + 16  # block + 6-tap reach each side, sublane-aligned
_SEG_MIN_T = 12000  # below this, segmentation is not worth the halo DMAs


def _sin_poly_coeffs(n_terms: int = 6) -> np.ndarray:
    """Least-squares fit of sin(2*pi*t) = t * P(t^2) on Chebyshev nodes of
    t in [-0.5, 0.5] (near-minimax, max abs error ~1e-8 at 6 terms =
    degree-11 odd). The VPU's exact sin costs ~25 cycles/element and
    dominated the whole activation (measured 1.85 ms vs 0.48 ms for the
    polynomial on 74M elements); snake only needs float32-level accuracy."""
    t = np.cos(np.linspace(0.0, np.pi, 4096)) * 0.5
    t = t[np.abs(t) > 1e-6]
    u = t * t
    y = np.sin(2 * np.pi * t) / t
    v = np.vander(u, n_terms, increasing=True)
    c, *_ = np.linalg.lstsq(v, y, rcond=None)
    return c.astype(np.float64)


_SIN_COEFFS = _sin_poly_coeffs()


def _fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x) for float32 x via range reduction + odd polynomial."""
    t = x * np.float32(1.0 / (2.0 * np.pi))
    t = t - jnp.round(t)
    u = t * t
    acc = jnp.full_like(u, np.float32(_SIN_COEFFS[-1]))
    for coef in _SIN_COEFFS[-2::-1]:
        acc = acc * u + np.float32(coef)
    return acc * t


def _band_matrices() -> np.ndarray:
    """[4, _BLK, _KW] f32: up-even, up-odd, down-even, down-odd bands.

    Row m of each matrix produces one output sample from the _KW-sample
    input window; the 6 taps sit on a diagonal band (see the phase
    equations in the module docstring; offsets derived so that an input
    window starting 8 rows before the block covers every tap in-bounds).
    """
    m_ue = np.zeros((_BLK, _KW), np.float32)
    m_uo = np.zeros((_BLK, _KW), np.float32)
    d_e = np.zeros((_BLK, _KW), np.float32)
    d_o = np.zeros((_BLK, _KW), np.float32)
    for m in range(_BLK):
        for i in range(6):
            m_ue[m, m + 10 - i] = 2.0 * float(_FILT[2 * i + 1])
            m_uo[m, m + 11 - i] = 2.0 * float(_FILT[2 * i])
            d_e[m, m + i + 6] = float(_FILT[2 * i + 1])
            d_o[m, m + i + 5] = float(_FILT[2 * i])
    return np.stack([m_ue, m_uo, d_e, d_o])


_BANDS = _band_matrices()
# Up-even stacked on up-odd [2*_BLK, _KW]: one MXU op produces both phases
# of a block, and the snake then runs once over the stacked result.
_UP_STACK = np.concatenate([_BANDS[0], _BANDS[1]], axis=0)


def _plan_tile(t: int, lanes: int, itemsize: int) -> Optional[int]:
    """Time-tile length (multiple of _BLK) whose full buffer set —
    double-buffered input scratch 2x(tile+32), snake buffers 2x(tile+16),
    double-buffered output 2x(tile) and the band matrices — fits under the
    VMEM budget. Multi-tile plans additionally need the last tile's
    remainder to be 0 or >= _HALO so every DMA window stays expressible
    with static in-VMEM offsets (see _kernel). None when even the minimum
    tile does not fit (very wide merged-lane inputs) — callers fall back
    to the unfused composite."""
    budget = 12 << 20

    def fits(tile: int) -> bool:
        return ((6 * tile + 6 * _HALO) * lanes + 4 * _BLK * _KW) * itemsize <= budget

    mults = [m for m in (18, 12, 9, 6, 4, 3, 2, 1) if fits(m * _BLK)]
    if not mults:
        return None
    t_cap = ((t + _BLK - 1) // _BLK) * _BLK
    if t_cap <= mults[0] * _BLK:
        return t_cap  # one tile covers the whole signal
    for m in mults:
        tile = m * _BLK
        r = t % tile
        if r == 0 or r >= _HALO:
            return tile
    return None


def _kernel(
    x_hbm, up_ref, dn_e_ref, dn_o_ref, alpha_ref, beta_ref, out_ref,
    scratch, v_e, v_o, y_buf, in_sem, in_sem2, out_sem,
    *, tile: int, t: int, nt: int, contig: bool, pipelined: bool,
):
    bg = pl.program_id(0)
    i = pl.program_id(1)
    g = bg * nt + i
    nb = x_hbm.shape[0]  # static
    ncells = nb * nt  # static
    slot = jax.lax.rem(g, 2)
    lanes = scratch.shape[-1]
    single = nt == 1  # static

    # `contig` (static): the leading axis holds CONTIGUOUS TIME SEGMENTS of
    # one signal, not independent batches — a [1, T, L] merged input viewed
    # as [nseg, T/nseg, L] (a free reshape) so the grid regains the
    # per-batch shape the DMA engine streams ~9x faster than one long
    # single-batch tile sequence (measured: 0.045 vs 0.391 ms for the same
    # bytes). Interior segment edges take their halo from the neighbouring
    # segment's rows via a second DMA; replicate fills apply only at the
    # global ends.

    # ---- input DMA variants (full 128-aligned lane extent; the head/last
    # tiles copy a shorter row range and the edge rows are replicated in
    # VMEM — an XLA `jnp.pad` would be a full extra HBM round trip).
    # scratch row r of a tile with output start o holds time o - _HALO + r.
    def _in_copy(sl, bb, src_lo, rows, dst_lo, sem=in_sem):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(src_lo, rows), :],
            scratch.at[sl, pl.ds(dst_lo, rows), :],
            sem.at[sl],
        )

    def in_single(sl, bb):
        return _in_copy(sl, bb, 0, t, _HALO)

    def in_head(sl, bb):
        return _in_copy(sl, bb, 0, tile + _HALO, _HALO)

    def in_mid(sl, bb, ii):
        # Mosaic must PROVE dynamic row starts divisible by the sublane
        # tiling; ii*tile - 16 is a multiple of 16 (tile is a multiple of
        # _BLK = 112 = 16*7) but the prover can't see through program-id
        # arithmetic — assert it.
        lo = pl.multiple_of(ii * tile - _HALO, _HALO)
        return _in_copy(sl, bb, lo, tile + 2 * _HALO, 0)

    def in_last(sl, bb):
        return _in_copy(sl, bb, t - (tile + _HALO), tile + _HALO, 0)

    # cross-segment halo copies (contig only; second semaphore so the
    # matched wait cannot confuse byte counts with the main copy)
    def in_prev_tail(sl, bb):
        return _in_copy(sl, bb - 1, t - _HALO, _HALO, 0, sem=in_sem2)

    def in_next_head(sl, bb):
        return _in_copy(sl, bb + 1, 0, _HALO, tile + _HALO, sem=in_sem2)

    def _for_each(sl, bb, ii, act):
        """Apply start()/wait() uniformly to the cell's copy set."""
        if single:
            act(in_single(sl, bb))
            if contig and nb > 1:

                @pl.when(bb > 0)
                def _():
                    act(in_prev_tail(sl, bb))

                @pl.when(bb < nb - 1)
                def _():
                    act(in_next_head(sl, bb))
            return

        @pl.when(ii == 0)
        def _():
            act(in_head(sl, bb))

        @pl.when(jnp.logical_and(ii > 0, ii < nt - 1))
        def _():
            act(in_mid(sl, bb, ii))

        @pl.when(ii == nt - 1)
        def _():
            act(in_last(sl, bb))

        if contig and nb > 1:

            @pl.when(jnp.logical_and(ii == 0, bb > 0))
            def _():
                act(in_prev_tail(sl, bb))

            @pl.when(jnp.logical_and(ii == nt - 1, bb < nb - 1))
            def _():
                act(in_next_head(sl, bb))

    @pl.when(g == 0)
    def _():
        _for_each(slot, bg, i, lambda c: c.start())

    @pl.when(g + 1 < ncells)
    def _():
        wraps = i + 1 == nt
        b2 = jnp.where(wraps, bg + 1, bg)
        i2 = jnp.where(wraps, 0, i + 1)
        _for_each(1 - slot, b2, i2, lambda c: c.start())

    # wait own input (variant must match the started copy's byte count)
    _for_each(slot, bg, i, lambda c: c.wait())

    # ---- in-VMEM replicate fills (the jnp.pad the kernel no longer pays);
    # with contig segments these are GLOBAL signal edges only — interior
    # segment edges already hold real neighbour rows from the halo DMAs.
    head_edge = jnp.logical_and(i == 0, bg == 0) if contig else i == 0
    tail_i = i == nt - 1
    tail_edge = jnp.logical_and(tail_i, bg == nb - 1) if contig else tail_i

    @pl.when(head_edge)
    def _():
        row = scratch[slot, _HALO, :]
        scratch[slot, pl.ds(0, _HALO), :] = jnp.broadcast_to(row, (_HALO, lanes))

    if single and not contig:
        # tail rows [16+t, tile+32) <- time t-1
        fill = tile + 2 * _HALO - (_HALO + t)
        if fill > 0:
            row = scratch[slot, _HALO + t - 1, :]
            scratch[slot, pl.ds(_HALO + t, fill), :] = jnp.broadcast_to(
                row, (fill, lanes)
            )
    else:

        @pl.when(tail_edge)
        def _():
            row = scratch[slot, tile + _HALO - 1, :]
            scratch[slot, pl.ds(tile + _HALO, _HALO), :] = jnp.broadcast_to(
                row, (_HALO, lanes)
            )

    # ---- fused, software-pipelined FIR/snake/FIR ----
    # The three streams are interleaved per 112-row block so the MXU
    # matmuls of block j+1 and the VPU snake of block j are textually
    # adjacent INDEPENDENT ops Mosaic's scheduler can overlap (the naive
    # loop-per-stage form measured perfectly additive: full = no-snake +
    # snake cost, i.e. zero MXU/VPU overlap).
    m_up = up_ref[0]
    d_e = dn_e_ref[0]
    d_o = dn_o_ref[0]
    alpha = alpha_ref[0, :].astype(jnp.float32)
    inv_beta = beta_ref[0, :].astype(jnp.float32)
    cur = scratch.at[slot]

    # HIGHEST keeps f32 inputs exact on the MXU (default precision runs
    # f32 matmuls as single-pass bf16 — a ~4e-3 relative error the
    # interpret-mode tests cannot see). bf16 inputs must use DEFAULT:
    # Mosaic rejects fp32 contract precision on bf16 operands.
    _prec = (
        jax.lax.Precision.HIGHEST
        if scratch.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    # output slot reuse guard (before y_buf writes begin)
    if single:
        o = 0
    else:
        o = pl.multiple_of(jnp.where(i == nt - 1, t - tile, i * tile), _HALO)
    out_rows = t if single else tile

    def _out_copy(sl, bb, oo):
        return pltpu.make_async_copy(
            y_buf.at[sl, pl.ds(0, out_rows), :],
            out_ref.at[bb, pl.ds(oo, out_rows), :],
            out_sem.at[sl],
        )

    if ncells > 2:  # wait the copy that used this slot two cells ago

        @pl.when(g >= 2)
        def _():
            _out_copy(slot, bg, o).wait()

    def dot_up(j):
        s = min(8 + j * _BLK, 8 + u_rows - _BLK)
        xin = cur[pl.ds(s - 8, _KW), :]
        return s, jnp.dot(
            m_up, xin, preferred_element_type=jnp.float32, precision=_prec
        )

    def snake_store(s, u):
        sn = _fast_sin(u * alpha)
        v = u + inv_beta * sn * sn
        v_e[pl.ds(s - 8, _BLK), :] = v[:_BLK].astype(v_e.dtype)
        v_o[pl.ds(s - 8, _BLK), :] = v[_BLK:].astype(v_o.dtype)

    def down_store(j):
        ve = v_e[pl.ds(j * _BLK, _KW), :]
        vo = v_o[pl.ds(j * _BLK, _KW), :]
        y = jnp.dot(
            d_e, ve, preferred_element_type=jnp.float32, precision=_prec
        ) + jnp.dot(d_o, vo, preferred_element_type=jnp.float32, precision=_prec)
        y_buf[slot, pl.ds(j * _BLK, _BLK), :] = y.astype(y_buf.dtype)

    def head_fill():
        # reference-exact edges: DownSample1d pads the post-snake signal
        # (5 left / 6 right, replicate). v buffer row k holds time o-8+k.
        @pl.when(head_edge)
        def _():
            row = v_e[8, :]
            v_e[pl.ds(6, 2), :] = jnp.broadcast_to(row, (2, lanes))
            v_o[pl.ds(5, 3), :] = jnp.broadcast_to(row, (3, lanes))

    def tail_fill():
        k0 = t + 8 if single else tile + 8  # static: v row of time t

        @pl.when(tail_edge)
        def _():
            row = v_o[k0 - 1, :]
            v_e[pl.ds(k0, 3), :] = jnp.broadcast_to(row, (3, lanes))
            v_o[pl.ds(k0, 3), :] = jnp.broadcast_to(row, (3, lanes))

    u_rows = tile + 2 * (_HALO - 8)  # v rows always span [0, tile+16)
    n_up = (u_rows + _BLK - 1) // _BLK  # == tile//_BLK + 1
    n_dn = tile // _BLK
    if pipelined:
        # software pipeline: up(j+1) issued before snake(j); down(j-1)
        # follows snake(j) (its 128-row window reaches 16 rows into block
        # j's output). Wins on mid-width lanes; loses where holding two
        # live [2*_BLK, lanes] f32 u blocks spills (autotuned dispatch in
        # _pick_pipelined).
        s_prev, u_prev = dot_up(0)
        for j in range(n_up):
            nxt = dot_up(j + 1) if j + 1 < n_up else None
            snake_store(s_prev, u_prev)
            if j == 0:
                head_fill()
            if j == n_up - 1:
                tail_fill()
            if 1 <= j and j - 1 < n_dn:
                down_store(j - 1)
            if nxt is not None:
                s_prev, u_prev = nxt
    else:
        # sequential stages: all up+snake blocks, edge fills, all downs
        for j in range(n_up):
            s, u = dot_up(j)
            snake_store(s, u)
        head_fill()
        tail_fill()
        for j in range(n_dn):
            down_store(j)

    _out_copy(slot, bg, o).start()

    @pl.when(g == ncells - 1)
    def _():
        _out_copy(slot, bg, o).wait()
        if ncells >= 2:
            _out_copy(1 - slot, bg, o).wait()


def _plan_segments(b: int, t: int, lanes: int, itemsize: int) -> int:
    """Segment count for merged single-batch inputs.

    A [1, T, L] signal is viewed as [nseg, T/nseg, L] contiguous time
    segments (a free reshape — row-major layout is identical) so the grid
    gets a leading axis: the DMA engine streams a (b, nt) grid ~9x faster
    than one long single-batch tile sequence (measured 0.045 vs 0.391 ms
    for identical bytes at [16,6000,384] vs [1,96000,384]). Segments need
    16-aligned length; per-segment plans must be multi-tile or exactly
    one tile (so cross-segment halo DMA destinations stay static).
    Targets ~6000 rows/segment — the measured sweet spot."""
    if b != 1 or t < _SEG_MIN_T or t % _HALO:
        return 1
    best, best_cost = 1, None
    for n in range(2, 33):
        if t % n or (t // n) % _HALO:
            continue
        tp = t // n
        tile = _plan_tile(tp, lanes, itemsize)
        if tile is None or (tile >= tp and tile != tp):
            continue
        cost = abs(tp - 6000)
        if best_cost is None or cost < best_cost:
            best, best_cost = n, cost
    return best


def _pick_pipelined(lanes: int, merged: bool) -> bool:
    """Kernel-body structure (TPU v5e matrix, scripts/exp_act_matrix.py):
    the software-pipelined body wins clearly at the widest and narrowest
    vocoder shapes (s0 0.41->0.12 ms, s5-merged 0.78->0.53 ms) and ties
    within measurement noise elsewhere, so it is the default; the
    sequential body stays selectable (DMEL_AA_PIPE=0) for A/B runs."""
    if _FORCE_PIPE is not None:
        return bool(int(_FORCE_PIPE))
    return True


_FORCE_PIPE = os.environ.get("DMEL_AA_PIPE") or None
_FORCE_NSEG = os.environ.get("DMEL_AA_NSEG") or None


@partial(jax.jit, static_argnames=("interpret", "pipelined", "force_nseg"))
def _fused_forward(
    x: jnp.ndarray,
    a_l: jnp.ndarray,
    invb_l: jnp.ndarray,
    interpret: bool = False,
    pipelined: Optional[bool] = None,
    force_nseg: Optional[int] = None,
) -> jnp.ndarray:
    """x: [B, T, L] with L a multiple of 128 (the caller merges/pads).

    Every DMA row start must sit on the HBM sublane tiling, so the kernel
    covers only the 16-aligned prefix t_k = T - T % 16; output rows
    [t_k, T) are left unwritten and the caller patches the tail (the
    halo makes rows >= t_k - 6 depend on the untouched tail samples).
    Merged single-batch inputs with 16-aligned T run segmented (see
    _plan_segments) with exact cross-segment halos."""
    b, t, lanes = x.shape
    tk = t - t % _HALO
    itemsize = jnp.dtype(x.dtype).itemsize
    if force_nseg is None and _FORCE_NSEG is not None:
        force_nseg = int(_FORCE_NSEG)
    if force_nseg is not None:
        nseg = force_nseg if (t % max(force_nseg, 1) == 0 and b == 1) else 1
    else:
        nseg = _plan_segments(b, t, lanes, itemsize)
    if pipelined is None:
        pipelined = _pick_pipelined(lanes, b == 1)
    contig = nseg > 1
    if contig:
        t_run = t // nseg
        xk = x.reshape(nseg, t_run, lanes)
        grid_b = nseg
    else:
        t_run = tk
        xk = x
        grid_b = b
    tile = _plan_tile(t_run, lanes, itemsize)
    assert tile is not None, "dispatch guarantees a VMEM-feasible tile"
    nt = 1 if tile >= t_run else pl.cdiv(t_run, tile)

    up = jnp.asarray(_UP_STACK, x.dtype)[None]
    dn_e = jnp.asarray(_BANDS[2], x.dtype)[None]
    dn_o = jnp.asarray(_BANDS[3], x.dtype)[None]

    const = lambda b_, i_: (0, 0, 0)
    y = pl.pallas_call(
        partial(
            _kernel, tile=tile, t=t_run, nt=nt, contig=contig,
            pipelined=pipelined,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid_b, t_run if contig else t, lanes), x.dtype
        ),
        grid=(grid_b, nt),
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
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xk, up, dn_e, dn_o, a_l, invb_l)
    if contig:
        y = y.reshape(1, t, lanes)
    return y


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


def _fast_composite(x: jnp.ndarray, a: jnp.ndarray, inv_b: jnp.ndarray):
    """XLA up-FIR -> polynomial snake -> down-FIR.

    Fallback for inputs whose minimum kernel tile exceeds VMEM (very wide
    merged-lane widths) and for DMEL_AA_FORCE=composite A/B runs. Exact at
    the edges by construction (it IS the reference op chain, with the
    polynomial sin)."""
    filt = jnp.asarray(_FILT, x.dtype)
    u = upsample1d(x, filt, 2, _KS)
    uf = u.astype(jnp.float32)
    s = _fast_sin(uf * a.astype(jnp.float32))
    v = (uf + inv_b.astype(jnp.float32) * s * s).astype(x.dtype)
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

    The kernel reproduces the reference semantics exactly, including the
    replicate-padded edges (see module docstring) — `exact_edges` is kept
    for API compatibility but no longer selects anything: every path is
    edge-exact. Dispatch: the Pallas kernel for every channel count
    (C < 128 runs lane-merged across the batch); the XLA composite only
    when the merged lane width exceeds VMEM or DMEL_AA_FORCE=composite.
    """
    b, t, c = x.shape
    if t < 32:
        return anti_alias_activation_reference(x, alpha, beta, logscale)
    a = jnp.exp(alpha) if logscale else alpha
    if beta is None:
        inv_b = 1.0 / (a + _SNAKE_EPS)
    else:
        bval = jnp.exp(beta) if logscale else beta
        inv_b = 1.0 / (bval + _SNAKE_EPS)

    merge = c < 128 and b > 1
    raw = c * b if merge else c
    lanes = -(-raw // 128) * 128
    itemsize = jnp.dtype(x.dtype).itemsize
    force = os.environ.get("DMEL_AA_FORCE", "")
    e = t % _HALO  # tail rows beyond the 16-aligned kernel prefix
    tile = _plan_tile(t - e, lanes, itemsize)
    if force == "composite" or tile is None:
        return _fast_composite(x, a, inv_b)

    if merge:
        # [B, T, C] -> [1, T, B*C]: HBM tensors are 128-lane tiled, so the
        # merged layout is the only one whose DMAs (and physical bytes)
        # aren't lane-padded; the relayout is one XLA transpose each way.
        xk = x.transpose(1, 0, 2).reshape(1, t, raw)
        a_v, ib_v = jnp.tile(a, b), jnp.tile(inv_b, b)
    else:
        xk, a_v, ib_v = x, a, inv_b
    if lanes > raw:  # tests / odd widths: pad lanes (1s keep garbage finite)
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, lanes - raw)))
        a_v = jnp.pad(a_v, (0, lanes - raw), constant_values=1.0)
        ib_v = jnp.pad(ib_v, (0, lanes - raw), constant_values=1.0)
    y = _fused_forward(xk, a_v[None], ib_v[None], interpret)
    if lanes > raw:
        y = y[..., :raw]
    if merge:
        y = y.reshape(t, b, c).transpose(1, 0, 2)
    if e:
        # ragged tail: the kernel covered [0, t-e) with replicate padding
        # at t-e; rows >= t-e-6 see the real tail samples (y[r] reaches
        # x[r+5] through the up FIR, +3 more through the down FIR) and
        # rows [t-e, t) were never written — recompute the last e+6 rows
        # with the oracle on a 32-row slice (only its first ~6 rows feel
        # the slice's own left boundary, far from the rows we keep).
        tail = anti_alias_activation_reference(
            x[:, -32:, :], alpha, beta, logscale
        )[:, -(e + 6):, :]
        y = y.at[:, -(e + 6):, :].set(tail.astype(y.dtype))
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
