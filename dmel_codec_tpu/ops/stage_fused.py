"""Fused small-channel AMP resblock stage — channels-first Pallas TPU kernel.

The BigVGAN tail stages (C in {96, 48, 24} at the flagship config) are the
headline-bench bottleneck: in the channels-last [B, T, C] layout every op
moves 128/C x its logical bytes (TPU HBM lane padding) and the public
anti-alias op pays a [B,T,C] <-> [1,T,B*C] XLA transpose pair PER
ACTIVATION (measured: kernel 0.53 ms vs 2.93 ms public at s5 — the
transposes dominate). This kernel instead runs a WHOLE upsample stage
(3 parallel AMP resblocks = 18 anti-aliased snakes + 18 weight-normed
convs + residuals + average, reference bigvgan.py:104-126) in one pass
over a channels-FIRST [B, C, T] layout:

  * time lives on the 128-wide lane axis -> every byte moved is real;
  * the 6-tap polyphase FIRs and the snake run on the VPU with lane
    rotates (pltpu.roll) — no 2x-rate signal ever touches HBM;
  * each conv tap is a [C_out, C_in] x [C_in, W] MXU matmul over the
    sublane (channel) axis — LOGICAL FLOPs, unlike the kron(I_B, w)
    block-diagonal form the merged-batch layout would need (B x FLOPs,
    measured end-to-end loser);
  * ONE HBM read + write per stage instead of 36 (the per-op round trips
    of the unfused path), with a +-H lane halo per tile.

Edge semantics are bit-compatible with the unfused oracle chain
(UpSample1d replicate / DownSample1d post-snake replicate, see
ops/anti_alias.py docstring; convs zero-pad): edge tiles patch the exact
boundary lanes in-kernel; only the non-128-aligned tail remainder is
recomputed outside with the XLA reference chain (same pattern as
ops/anti_alias.py).

Reference parity: this fuses the conv->act->conv chains of
models/modules/bigvgan/bigvgan.py:104-147 (AMPBlock1); the CUDA analogue
fuses only the activation (anti_alias_activation_cuda.cu:44-179) — fusing
the whole stage is what the TPU layout/bandwidth trade demands.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_codec_tpu.nn.resample import downsample1d, upsample1d
from dmel_codec_tpu.nn.snake import snake, snake_beta
from dmel_codec_tpu.nn.weight_norm import weight_norm_kernel
from dmel_codec_tpu.ops.anti_alias import _BANDS, _FILT, _UP_STACK, _fast_sin

_EPS = 1e-9
_F = np.asarray(_FILT, np.float64)
_BLK = 112  # banded-FIR output rows per MXU block (matches ops/anti_alias)
_KW = 128  # banded-FIR input window rows


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """Static description of one upsample stage's resblock group."""

    channels: int
    kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"  # "snake" | "snakebeta"
    logscale: bool = True

    @property
    def receptive(self) -> int:
        """Max one-side reach of a whole block chain (act=6, conv=d(k-1)/2)."""
        r = 0
        for k, dils in zip(self.kernel_sizes, self.dilations):
            rb = sum(6 + d * (k - 1) // 2 + 6 + (k - 1) // 2 for d in dils)
            r = max(r, rb)
        return r


def pack_stage(resblocks: Sequence[dict], spec: StageSpec) -> dict:
    """Flax resblock param subtrees -> kernel-ready arrays (traced, cheap).

    resblocks: [{conv1_j: {v,g,bias}, conv2_j: {...}, act_a: {alpha[,beta]}}]
    Returns {w: [18 arrays [k, C_out, C_in]], b: [C, 18], a: [C, 36],
    ib: [C, 36]} with weight-norm materialised and alpha/beta pre-exp'd.
    """
    ws, biases, alphas, inv_betas = [], [], [], []
    for blk in resblocks:
        n_dil = len([k for k in blk if k.startswith("conv1_")])
        for j in range(n_dil):
            for name in (f"conv1_{j}", f"conv2_{j}"):
                p = blk[name]
                w = weight_norm_kernel(p["v"], p["g"], axis=2)  # [k, ci, co]
                ws.append(jnp.transpose(w, (0, 2, 1)))  # [k, co, ci]
                biases.append(p["bias"])
        for a_idx in range(2 * n_dil):
            p = blk[f"act_{a_idx}"]
            alpha = p["alpha"]
            if spec.logscale:
                alpha = jnp.exp(alpha)
            if spec.activation == "snakebeta":
                beta = p["beta"]
                if spec.logscale:
                    beta = jnp.exp(beta)
            else:
                beta = alpha
            alphas.append(alpha)
            inv_betas.append(1.0 / (beta + _EPS))
    to_cols = lambda lst: jnp.stack(lst, axis=1).astype(jnp.float32)  # [C, n]
    return {
        "w": ws,
        "b": to_cols(biases),
        "a": to_cols(alphas),
        "ib": to_cols(inv_betas),
    }


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _roll(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """value[..., L + m] (circular on lanes; halo absorbs the wrap)."""
    if m == 0:
        return x
    return pltpu.roll(x, shift=(-m) % x.shape[-1], axis=x.ndim - 1)


def _kernel(*refs, spec: StageSpec, W: int, H: int, t: int, nt: int):
    n_convs = sum(2 * len(d) for d in spec.dilations)
    x_hbm = refs[0]
    w_refs = refs[1 : 1 + n_convs]
    b_ref, a_ref, ib_ref = refs[1 + n_convs : 4 + n_convs]
    out_hbm = refs[4 + n_convs]
    scratch, acc, xb, t1, pe, po, ob, in_sem, out_sem = refs[5 + n_convs :]

    b = pl.program_id(0)
    i = pl.program_id(1)
    g = b * nt + i
    c = scratch.shape[0]
    Wf = W + 2 * H
    head = i == 0
    tail = i == nt - 1

    # matmul precision: f32 inputs must contract exactly (HIGHEST); bf16
    # inputs use the fast single-pass path (same policy as ops/anti_alias).
    f32_in = scratch.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_in else jax.lax.Precision.DEFAULT
    mm_dtype = jnp.float32 if f32_in else jnp.bfloat16

    # ---- input DMA (lane windows 128-aligned by construction: W, H, and
    # t are multiples of 128; the caller guarantees t % 128 == 0)
    def in_copy(src_lo, lanes_n, dst_lo):
        return pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(src_lo, lanes_n)],
            scratch.at[:, pl.ds(dst_lo, lanes_n)],
            in_sem,
        )

    @pl.when(head)
    def _():
        in_copy(0, W + H, H).start()

    @pl.when(jnp.logical_and(i > 0, i < nt - 1))
    def _():
        in_copy(pl.multiple_of(i * W - H, 128), Wf, 0).start()

    @pl.when(jnp.logical_and(tail, i > 0))
    def _():
        in_copy(t - W - H, W + H, 0).start()

    # previous cell's output copy must land before we overwrite ob
    @pl.when(g > 0)
    def _():
        pltpu.make_async_copy(
            ob, out_hbm.at[b, :, pl.ds(0, W)], out_sem
        ).wait()

    @pl.when(head)
    def _():
        in_copy(0, W + H, H).wait()

    @pl.when(jnp.logical_and(i > 0, i < nt - 1))
    def _():
        in_copy(pl.multiple_of(i * W - H, 128), Wf, 0).wait()

    @pl.when(jnp.logical_and(tail, i > 0))
    def _():
        in_copy(t - W - H, W + H, 0).wait()

    # ---- edge fixups (static lane positions; head tile: time 0 at lane H,
    # tail tile: time t at lane H + W)
    def fix_replicate(ref):
        @pl.when(head)
        def _():
            ref[:, 0:H] = jnp.broadcast_to(ref[:, H : H + 1], (c, H))

        @pl.when(tail)
        def _():
            ref[:, H + W :] = jnp.broadcast_to(
                ref[:, H + W - 1 : H + W], (c, H)
            )

    def fix_zero(ref):
        @pl.when(head)
        def _():
            ref[:, 0:H] = jnp.zeros((c, H), ref.dtype)

        @pl.when(tail)
        def _():
            ref[:, H + W :] = jnp.zeros((c, H), ref.dtype)

    def fix_v_phases():
        # reference-exact: DownSample1d replicate-pads the post-snake 2x
        # signal 5/6 -> in polyphase terms (ops/anti_alias.py docstring):
        # head: v_e[-1..-2] = v_o[-1..-3] = v_e[0]
        # tail: v_e[t..t+2] = v_o[t..t+2] = v_o[t-1]
        @pl.when(head)
        def _():
            row = pe[:, H : H + 1]
            pe[:, H - 2 : H] = jnp.broadcast_to(row, (c, 2))
            po[:, H - 3 : H] = jnp.broadcast_to(row, (c, 3))

        @pl.when(tail)
        def _():
            row = po[:, H + W - 1 : H + W]
            pe[:, H + W : H + W + 3] = jnp.broadcast_to(row, (c, 3))
            po[:, H + W : H + W + 3] = jnp.broadcast_to(row, (c, 3))

    # ---- ops on whole planes
    def act(src_ref, a_col, ib_col, dst_ref):
        fix_replicate(src_ref)
        x = src_ref[...].astype(jnp.float32)
        sh = {m: _roll(x, m) for m in range(-3, 4)}
        u_e = jnp.zeros_like(x)
        u_o = jnp.zeros_like(x)
        for ii in range(6):
            u_e = u_e + np.float32(2.0 * _F[2 * ii + 1]) * sh[2 - ii]
            u_o = u_o + np.float32(2.0 * _F[2 * ii]) * sh[3 - ii]
        s_e = _fast_sin(u_e * a_col)
        s_o = _fast_sin(u_o * a_col)
        pe[...] = u_e + ib_col * s_e * s_e
        po[...] = u_o + ib_col * s_o * s_o
        fix_v_phases()
        ve = pe[...]
        vo = po[...]
        y = jnp.zeros_like(x)
        for ii in range(6):
            y = y + np.float32(_F[2 * ii + 1]) * _roll(ve, ii - 2)
            y = y + np.float32(_F[2 * ii]) * _roll(vo, ii - 3)
        dst_ref[...] = y

    def conv(src_ref, w_ref, b_col, d: int, k: int, dst_ref):
        fix_zero(src_ref)
        x = src_ref[...].astype(jnp.float32)
        y = None
        half = (k - 1) // 2
        for tap in range(k):
            a_mat = w_ref[tap].astype(mm_dtype)
            # roll in f32 (TPU lane rotate is 32-bit only), cast for the MXU
            term = jnp.dot(
                a_mat,
                _roll(x, (tap - half) * d).astype(mm_dtype),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            y = term if y is None else y + term
        dst_ref[...] = y + b_col

    def col(ref, j):
        return ref[:, j : j + 1]

    # ---- stage chain: acc = mean_b AMPBlock_b(x)
    x_in = scratch[...].astype(jnp.float32)
    conv_i = 0
    act_i = 0
    for bi, (k, dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
        xb[...] = x_in
        for d in dils:
            act(xb, col(a_ref, act_i), col(ib_ref, act_i), t1)
            act_i += 1
            conv(t1, w_refs[conv_i], col(b_ref, conv_i), d, k, t1)
            conv_i += 1
            act(t1, col(a_ref, act_i), col(ib_ref, act_i), t1)
            act_i += 1
            conv(t1, w_refs[conv_i], col(b_ref, conv_i), 1, k, t1)
            conv_i += 1
            xb[...] = xb[...] + t1[...]
        if bi == 0:
            acc[...] = xb[...]
        else:
            acc[...] = acc[...] + xb[...]

    # ---- output: average, cast, DMA the valid window
    acc[...] = acc[...] * np.float32(1.0 / len(spec.kernel_sizes))

    ob[...] = acc[:, H : H + W].astype(ob.dtype)
    out_lo = jnp.where(tail, t - W, i * W)
    pltpu.make_async_copy(
        ob,
        out_hbm.at[b, :, pl.ds(pl.multiple_of(out_lo, 128), W)],
        out_sem,
    ).start()

    @pl.when(g == pl.num_programs(0) * nt - 1)
    def _():
        pltpu.make_async_copy(
            ob,
            out_hbm.at[b, :, pl.ds(pl.multiple_of(out_lo, 128), W)],
            out_sem,
        ).wait()


# ---------------------------------------------------------------------------
# v2 kernel: time on SUBLANES, channels on lanes
# ---------------------------------------------------------------------------
#
# The v1 layout (time on lanes) makes every FIR tap and conv tap a LANE
# rotate — a VPU pass per tap, ~16 rotate + 24 FMA passes per activation,
# which measured VPU-issue-bound (~48 ms/stage at the flagship tail
# shapes, 2.05x over unfused but 270x off the memory bound). With time on
# sublanes a shift is a free static ROW slice, so:
#   * activations run the production banded-FIR MXU form (ops/anti_alias):
#     stacked up-band [2*_BLK,_KW] @ window, snake on the VPU, down-bands —
#     measured 0.53 ms/act at s5 in the standalone act kernel;
#   * conv taps are sublane-sliced reads + ONE right-matmul
#     [rows, gc] @ [gc, gc] each — no rotates at all.
# Validity bookkeeping: acts compute output rows [8, Wf-8) (banded blocks),
# convs rows [32, Wf-32) (max tap offset 25 at k=11,d=5); the worst chain
# shrinks 3*(8+32+8+32) = 240 rows per side, so the halo is H2=256.


_ACT_IN = 8  # act block inset (window reaches 8 rows past the block)
_CONV_IN = 32  # conv inset (max dilated tap offset 25, 8-row aligned)
_CBLK = 512  # conv row-block ceiling: bounds the per-tap xs/term/y
#              temporaries to ~cb*L VMEM stack instead of ~Wf*L


def _conv_blk(lanes: int, rows_c: int) -> int:
    """Conv row-block: Mosaic's stack allocator does NOT reuse the f32
    [cb, lanes] tap products across the UNROLLED tap matmuls, so conv
    stack ~= (k+1) * cb * lanes * 4 B. Cap it at ~4 MB for the worst conv
    (k=11) to stay inside the 16 MB scoped-VMEM limit (calibrated on the
    observed L=256/f32 OOM: 12 * 512 * 256 * 4 = 6.3 M stack + 11.8 M
    scratch = the reported 20.1 M)."""
    cap = max(64, int(4.0e6 / (12 * 4 * lanes)) // 8 * 8)
    return min(_CBLK, rows_c, cap)


def _v2_reach(spec: StageSpec) -> int:
    """Worst-case one-side validity shrink of the v2 chain.

    Recurrence lo' = max(computed_from, lo + reach) per op: acts compute
    rows [11, Wf-11) usefully (the two zeroed v-guard rows contaminate
    [8, 11)) with reach 6; convs compute [32, Wf-32) with reach
    d*(k-1)/2. Flagship spec -> 117 (fits a 128-row halo)."""
    worst = 0
    for k, dils in zip(spec.kernel_sizes, spec.dilations):
        lo = 0
        for d in dils:
            lo = max(11, lo + 6)
            lo = max(_CONV_IN, lo + d * (k - 1) // 2)
            lo = max(11, lo + 6)
            lo = max(_CONV_IN, lo + (k - 1) // 2)
        worst = max(worst, lo)
    return worst


def _kernel_v2(
    *refs, spec: StageSpec, W: int, H: int, t: int, nt: int, stream: bool = False
):
    n_convs = sum(2 * len(d) for d in spec.dilations)
    n_w = len(spec.kernel_sizes) if stream else n_convs
    x_hbm = refs[0]
    w_refs = refs[1 : 1 + n_w]
    up_ref, de_ref, do_ref = refs[1 + n_w : 4 + n_w]
    b_ref, a_ref, ib_ref = refs[4 + n_w : 7 + n_w]
    out_hbm = refs[7 + n_w]
    if stream:
        (scratch, acc, xb, t1a, t1b, pe, po, ob, wbuf, in_sem, out_sem, wsem) = refs[
            7 + n_w + 1 :
        ]
    else:
        (scratch, acc, xb, t1a, t1b, pe, po, ob, in_sem, out_sem) = refs[7 + n_w + 1 :]
        wbuf = wsem = None

    b = pl.program_id(0)
    i = pl.program_id(1)
    g = b * nt + i
    gc = scratch.shape[1]
    Wf = W + 2 * H
    head = i == 0
    tail = i == nt - 1

    f32_in = scratch.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_in else jax.lax.Precision.DEFAULT
    mm_dtype = jnp.float32 if f32_in else jnp.bfloat16
    # inter-op planes (t1a/t1b/pe/po) carry the INPUT dtype: in bf16
    # serving the unfused production path stores bf16 between ops too, so
    # this is the same numeric contract — and it halves the plane VMEM,
    # which buys a larger W (less halo overcompute). acc/xb (the residual
    # spine) stay f32.
    p_dtype = t1a.dtype

    m_up = up_ref[...]
    d_e = de_ref[...]
    d_o = do_ref[...]

    # ---- input DMA (row windows; all offsets multiples of 128)
    def in_copy(src_lo, rows_n, dst_lo):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_lo, rows_n), :],
            scratch.at[pl.ds(dst_lo, rows_n), :],
            in_sem,
        )

    @pl.when(head)
    def _():
        in_copy(0, W + H, H).start()

    @pl.when(jnp.logical_and(i > 0, i < nt - 1))
    def _():
        in_copy(pl.multiple_of(i * W - H, 128), Wf, 0).start()

    @pl.when(jnp.logical_and(tail, i > 0))
    def _():
        in_copy(t - W - H, W + H, 0).start()

    @pl.when(g > 0)
    def _():
        pltpu.make_async_copy(ob, out_hbm.at[b, pl.ds(0, W), :], out_sem).wait()

    @pl.when(head)
    def _():
        in_copy(0, W + H, H).wait()

    @pl.when(jnp.logical_and(i > 0, i < nt - 1))
    def _():
        in_copy(pl.multiple_of(i * W - H, 128), Wf, 0).wait()

    @pl.when(jnp.logical_and(tail, i > 0))
    def _():
        in_copy(t - W - H, W + H, 0).wait()

    # ---- edge fixups (head tile: time 0 at row H; tail: time t at H + W)
    def fix_replicate(ref):
        @pl.when(head)
        def _():
            ref[pl.ds(0, H), :] = jnp.broadcast_to(ref[H, :], (H, gc))

        @pl.when(tail)
        def _():
            ref[pl.ds(H + W, H), :] = jnp.broadcast_to(ref[H + W - 1, :], (H, gc))

    def fix_zero(ref):
        @pl.when(head)
        def _():
            ref[pl.ds(0, H), :] = jnp.zeros((H, gc), ref.dtype)

        @pl.when(tail)
        def _():
            ref[pl.ds(H + W, H), :] = jnp.zeros((H, gc), ref.dtype)

    def fix_v_phases():
        # DownSample1d replicate-pads the post-snake 2x signal 5/6 ->
        # head: v_e[-1..-2] = v_o[-1..-3] = v_e[0]; tail: v_e[t..t+2] =
        # v_o[t..t+2] = v_o[t-1] (same as v1 / ops/anti_alias fills).
        @pl.when(head)
        def _():
            row = pe[H, :]
            pe[pl.ds(H - 2, 2), :] = jnp.broadcast_to(row, (2, gc))
            po[pl.ds(H - 3, 3), :] = jnp.broadcast_to(row, (3, gc))

        @pl.when(tail)
        def _():
            row = po[H + W - 1, :]
            pe[pl.ds(H + W, 3), :] = jnp.broadcast_to(row, (3, gc))
            po[pl.ds(H + W, 3), :] = jnp.broadcast_to(row, (3, gc))

    u_rows = Wf - 2 * _ACT_IN
    n_blk = -(-u_rows // _BLK)

    # The up blocks only cover v rows [8, Wf-8); the 8 guard rows at each
    # end would otherwise feed uninitialised VMEM (NaN x a zero band
    # coefficient is still NaN) into the down windows. Zero them once —
    # the finite-but-wrong boundary rows stay >= 100 rows inside the
    # halo's validity slack (worst-case chain shrink is 117 rows/side).
    zg = jnp.zeros((_ACT_IN, gc), p_dtype)
    pe[pl.ds(0, _ACT_IN), :] = zg
    po[pl.ds(0, _ACT_IN), :] = zg
    pe[pl.ds(Wf - _ACT_IN, _ACT_IN), :] = zg
    po[pl.ds(Wf - _ACT_IN, _ACT_IN), :] = zg

    def act(src_ref, a_row, ib_row, dst_ref):
        fix_replicate(src_ref)
        # up + snake per block (banded MXU, production form)
        for j in range(n_blk):
            r0 = min(_ACT_IN + j * _BLK, Wf - _ACT_IN - _BLK)
            w0 = r0 - _ACT_IN
            win = src_ref[pl.ds(w0, _KW), :].astype(mm_dtype)
            u = jnp.dot(
                m_up.astype(mm_dtype), win,
                preferred_element_type=jnp.float32, precision=prec,
            )
            s = _fast_sin(u * a_row)
            v = (u + ib_row * s * s).astype(p_dtype)
            pe[pl.ds(r0, _BLK), :] = v[:_BLK]
            po[pl.ds(r0, _BLK), :] = v[_BLK:]
        fix_v_phases()
        for j in range(n_blk):
            r0 = min(_ACT_IN + j * _BLK, Wf - _ACT_IN - _BLK)
            w0 = r0 - _ACT_IN
            ve = pe[pl.ds(w0, _KW), :].astype(mm_dtype)
            vo = po[pl.ds(w0, _KW), :].astype(mm_dtype)
            y = jnp.dot(
                d_e.astype(mm_dtype), ve,
                preferred_element_type=jnp.float32, precision=prec,
            ) + jnp.dot(
                d_o.astype(mm_dtype), vo,
                preferred_element_type=jnp.float32, precision=prec,
            )
            dst_ref[pl.ds(r0, _BLK), :] = y.astype(p_dtype)
        # Zero the uncomputed guard rows: a later matmul contracts over the
        # FULL window, and 0-coefficient x NaN (uninitialised VMEM) would
        # poison whole blocks. Zeros are finite-wrong; the error spreads
        # only by op reach (<= 117 rows/side, inside the halo slack).
        dst_ref[pl.ds(0, _ACT_IN), :] = zg
        dst_ref[pl.ds(Wf - _ACT_IN, _ACT_IN), :] = zg

    rows_c = Wf - 2 * _CONV_IN
    cb = _conv_blk(gc, rows_c)  # conv row-block (bounds the VMEM stack)
    n_cb = -(-rows_c // cb)
    zgc = jnp.zeros((_CONV_IN, gc), p_dtype)

    # Weight access. Resident mode reads the VMEM-resident block-diagonal
    # stacks. Streaming (gc > 128, where 18 resident [k,L,L] stacks would
    # blow VMEM) has two granularities, both the guide's canonical 2-slot
    # rotation with depth-1 prefetch (start fetch i+1, wait i, compute i):
    #   * "conv"  — one conv's whole [k,L,L] tap stack per rotation (no
    #     re-traffic; needs a 2*kmax*L*L buffer, fits L=256 bf16);
    #   * "tap"   — one [L,L] tap matrix per rotation, scheduled
    #     (conv-in-chain, row-block, tap) so the tiny buffer works at any
    #     L; re-fetches each tap n_cb times (the ~L^2*isz copy hides under
    #     the 2*cb*L^2 FLOP tap matmul for cb >= ~2*isz rows).
    # Both schedules are built by the SAME loop structure that consumes
    # them, so the order contract holds by construction.
    if stream:
        conv_map = []  # chain order -> (resblock gi, conv-in-block ri, k)
        for _gi, (_k, _dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
            for _ri in range(2 * len(_dils)):
                conv_map.append((_gi, _ri, _k))

    if stream == "conv":

        def _w_dma(ci):
            gi, ri, k = conv_map[ci]
            slot = ci % 2
            return pltpu.make_async_copy(
                w_refs[gi].at[ri], wbuf.at[slot, pl.ds(0, k)], wsem.at[slot]
            )

        _w_dma(0).start()
    elif stream == "tap":
        tap_sched = []  # flat (gi, ri, tap) in exact consumption order
        for _gi, _ri, _k in conv_map:
            for _j in range(n_cb):
                for _tap in range(_k):
                    tap_sched.append((_gi, _ri, _tap))

        def _w_dma_tap(fi):
            gi, ri, tap = tap_sched[fi]
            return pltpu.make_async_copy(
                w_refs[gi].at[ri, tap], wbuf.at[fi % 2], wsem.at[fi % 2]
            )

        _w_dma_tap(0).start()
        _fi = [0]

        def _next_tap(_j, _tap):
            fi = _fi[0]
            if fi + 1 < len(tap_sched):
                _w_dma_tap(fi + 1).start()
            _w_dma_tap(fi).wait()
            _fi[0] = fi + 1
            return wbuf[fi % 2]

    def _conv_weights(ci):
        """-> get_tap(j, tap) yielding conv ci's [L, L] tap matrix."""
        if not stream:
            r = w_refs[ci]
            return lambda j, tap: r[tap]
        if stream == "conv":
            if ci + 1 < len(conv_map):
                _w_dma(ci + 1).start()
            _w_dma(ci).wait()
            s = wbuf.at[ci % 2]
            return lambda j, tap: s[tap]
        return _next_tap

    def conv(src_ref, get_tap, b_row, d: int, k: int, dst_ref):
        fix_zero(src_ref)
        half = (k - 1) // 2
        # row-blocked: per block the tap matmuls accumulate in a cb-row
        # stack frame instead of a full Wf-row one; Mosaic does not reuse
        # the unrolled taps' f32 products, so cb is capped by _conv_blk
        for j in range(n_cb):
            r0 = min(_CONV_IN + j * cb, Wf - _CONV_IN - cb)
            y = None
            for tap in range(k):
                off = (tap - half) * d
                xs = src_ref[pl.ds(r0 + off, cb), :].astype(mm_dtype)
                term = jnp.dot(
                    xs, get_tap(j, tap).astype(mm_dtype),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                y = term if y is None else y + term
            dst_ref[pl.ds(r0, cb), :] = (y + b_row).astype(p_dtype)
        dst_ref[pl.ds(0, _CONV_IN), :] = zgc
        dst_ref[pl.ds(Wf - _CONV_IN, _CONV_IN), :] = zgc

    def row(ref, j):
        return ref[j, :]

    # ---- stage chain: acc = mean_b AMPBlock_b(x)
    conv_i = 0
    act_i = 0
    for bi, (k, dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
        xb[...] = scratch[...].astype(jnp.float32)
        for d in dils:
            act(xb, row(a_ref, act_i), row(ib_ref, act_i), t1a)
            act_i += 1
            conv(t1a, _conv_weights(conv_i), row(b_ref, conv_i), d, k, t1b)
            conv_i += 1
            act(t1b, row(a_ref, act_i), row(ib_ref, act_i), t1a)
            act_i += 1
            conv(t1a, _conv_weights(conv_i), row(b_ref, conv_i), 1, k, t1b)
            conv_i += 1
            xb[...] = xb[...] + t1b[...]
        if bi == 0:
            acc[...] = xb[...]
        else:
            acc[...] = acc[...] + xb[...]

    # trace-time invariant: the chain consumed every conv exactly once and
    # (tap mode) every scheduled tap fetch exactly once
    assert conv_i == n_convs and (not stream or conv_i == len(conv_map))
    assert stream != "tap" or _fi[0] == len(tap_sched), (_fi[0], len(tap_sched))

    ob[...] = (acc[pl.ds(H, W), :] * np.float32(1.0 / len(spec.kernel_sizes))).astype(
        ob.dtype
    )
    out_lo = jnp.where(tail, t - W, i * W)
    pltpu.make_async_copy(
        ob, out_hbm.at[b, pl.ds(pl.multiple_of(out_lo, 128), W), :], out_sem
    ).start()

    @pl.when(g == pl.num_programs(0) * nt - 1)
    def _():
        pltpu.make_async_copy(
            ob, out_hbm.at[b, pl.ds(pl.multiple_of(out_lo, 128), W), :], out_sem
        ).wait()


@partial(jax.jit, static_argnames=("spec", "interpret", "tile_w"))
def fused_amp_stage_v2(
    x: jnp.ndarray,
    packed: dict,
    spec: StageSpec,
    interpret: bool = False,
    tile_w: Optional[int] = None,
) -> jnp.ndarray:
    """[B, T, C] -> [B, T, C], one fused stage — time-on-sublanes kernel."""
    bsz, t, c = x.shape
    reach = _v2_reach(spec)
    H = 128 if reach <= 128 else 256  # halo: covers the validity shrink
    assert reach <= H and spec.receptive < H
    for k, dls in zip(spec.kernel_sizes, spec.dilations):
        assert max(dls) * (k - 1) // 2 <= _CONV_IN - 1, (k, dls)
    W = tile_w or 2048
    tk = t - t % 128

    g = 1
    for cand in range(min(bsz, 128 // c), 0, -1):
        if bsz % cand == 0:
            g = cand
            break
    gc = g * c
    n_convs = sum(2 * len(d) for d in spec.dilations)
    # gc > 128 (i.e. L >= 256): the 18 resident block-diagonal weight
    # stacks would need 9-37 MB of VMEM — stream tap weights from HBM
    # instead: per-CONV [k,L,L] stacks when the 2-slot buffer fits
    # (L=256 bf16: 2.9 MB, zero re-traffic), per-TAP [L,L] matrices
    # otherwise (any L; re-fetches each tap n_cb times). gc == 128 stays
    # resident.
    isz = x.dtype.itemsize
    lanes = -(-gc // 128) * 128
    kmax = max(spec.kernel_sizes)
    stream: bool | str = False
    if gc > 128:
        stream = "conv" if 2 * kmax * lanes * lanes * isz <= 3_500_000 else "tap"

    # inter-op planes (t1a/t1b/pe/po) carry the input dtype in bf16
    # serving (the unfused path stores bf16 between ops too); the residual
    # spine (acc, xb) stays f32
    psz = isz if x.dtype == jnp.bfloat16 else 4

    def _vmem(w_rows: int) -> int:
        wf = w_rows + 2 * H
        # planes: scratch (isz) + acc/xb (f32) + t1a/t1b/pe/po (psz)
        planes = wf * lanes * (isz + 2 * 4 + 4 * psz) + w_rows * lanes * isz
        if stream == "conv":
            wbytes = 2 * kmax * lanes * lanes * isz
        elif stream == "tap":
            wbytes = 2 * lanes * lanes * isz
        else:
            wbytes = sum(kk * gc * gc for kk in
                         [k for k, dl in zip(spec.kernel_sizes, spec.dilations)
                          for _ in dl for _ in range(2)]) * isz
        # Mosaic stack: the conv's unrolled per-tap f32 products are NOT
        # reused ((kmax+1) * cb * lanes * 4), plus the act block's u/s/v
        cb = _conv_blk(lanes, wf - 2 * _CONV_IN)
        stack = (kmax + 1) * cb * lanes * 4 + 4 * (2 * _BLK) * lanes * 4
        return planes + wbytes + stack + 3 * n_convs * lanes * 4

    # 14.5 M against the 16 M scoped-VMEM cap: _vmem counts the Mosaic
    # stack honestly (validated vs a compiler-reported OOM: model 19.0 M
    # where the compiler measured 20.1 M), so ~1.5 M of slack suffices
    budget = int(14.5 * 1024 * 1024)
    while W > 256 and _vmem(W) > budget:
        W //= 2
    # Interior-tile DMA windows reach (nt-1)*W + H rows: the last tile's
    # remainder must be 0 or >= H or the window runs past the input (the
    # same constraint ops/anti_alias._plan_tile enforces). Shed the short
    # remainder onto the exact tail patch instead.
    rem = tk % W
    if 0 < rem < H:
        tk -= rem
    if _vmem(W) > budget or t < W + 128 or tk < W + 128:
        return stage_reference(x, packed, spec)

    # [B,T,C] -> [B/g, T, g*C]: g batch elements fold onto the lane axis.
    # Mosaic DMA windows must be 128-lane aligned, so the merged lane axis
    # pads to the next 128 multiple (the pad fuses into the relayout write;
    # padded lanes carry zeros through the whole chain: zero weights, zero
    # alpha/beta columns).
    L = -(-gc // 128) * 128
    x_m = x.reshape(bsz // g, g, t, c).transpose(0, 2, 1, 3).reshape(bsz // g, t, gc)
    if L != gc:
        x_m = jnp.pad(x_m, ((0, 0), (0, 0), (0, L - gc)))
    nt = pl.cdiv(tk, W)
    dtype = x.dtype
    p_dt = dtype if dtype == jnp.bfloat16 else jnp.float32
    Wf = W + 2 * H

    def blockdiag_r(w):  # [k, co, ci] -> [k, L, L] (right-matmul form)
        wt = jnp.transpose(w, (0, 2, 1))  # [k, ci, co]
        kk = w.shape[0]
        if g > 1:
            eye = jnp.eye(g, dtype=w.dtype)
            wt = jnp.einsum("gh,kio->kgiho", eye, wt).reshape(kk, gc, gc)
        if L != gc:
            wt = jnp.pad(wt, ((0, 0), (0, L - gc), (0, L - gc)))
        return wt

    def tile_rows(m):  # [c, n] -> [n, L]
        mt = jnp.transpose(m)
        if g > 1:
            mt = jnp.tile(mt, (1, g))
        if L != gc:
            mt = jnp.pad(mt, ((0, 0), (0, L - gc)))
        return mt

    const2 = lambda b_, i_: (0, 0)

    if stream:
        w_in = []
        ci = 0
        for k, dils in zip(spec.kernel_sizes, spec.dilations):
            rows = [
                blockdiag_r(packed["w"][ci + j]).astype(dtype)
                for j in range(2 * len(dils))
            ]
            ci += 2 * len(dils)
            w_in.append(jnp.stack(rows))  # [2*len(dils), k, L, L]
        w_specs = [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM) for _ in w_in
        ]
        wbuf_shape = (2, kmax, L, L) if stream == "conv" else (2, L, L)
        w_scratch = [pltpu.VMEM(wbuf_shape, dtype)]
        w_sems = [pltpu.SemaphoreType.DMA((2,))]
    else:
        w_in = [blockdiag_r(w).astype(dtype) for w in packed["w"]]
        w_specs = [
            pl.BlockSpec((kk, L, L), lambda b_, i_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
            for kk in [
                k
                for k, dils in zip(spec.kernel_sizes, spec.dilations)
                for _ in dils
                for _ in range(2)
            ]
        ]
        w_scratch = []
        w_sems = []

    y_m = pl.pallas_call(
        partial(_kernel_v2, spec=spec, W=W, H=H, t=tk, nt=nt, stream=stream),
        out_shape=jax.ShapeDtypeStruct((bsz // g, tk, L), dtype),
        grid=(bsz // g, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + w_specs
        + [
            pl.BlockSpec((2 * _BLK, _KW), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, _KW), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, _KW), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, L), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, L), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_convs, L), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((Wf, L), dtype),  # scratch (input tile)
            pltpu.VMEM((Wf, L), jnp.float32),  # acc
            pltpu.VMEM((Wf, L), jnp.float32),  # xb
            pltpu.VMEM((Wf, L), p_dt),  # t1a
            pltpu.VMEM((Wf, L), p_dt),  # t1b
            pltpu.VMEM((Wf, L), p_dt),  # pe (v even)
            pltpu.VMEM((Wf, L), p_dt),  # po (v odd)
            pltpu.VMEM((W, L), dtype),  # ob (output staging)
        ]
        + w_scratch  # wbuf (stream mode: 2-slot tap rotation)
        + [
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        + w_sems,
        interpret=interpret,
    )(
        x_m,
        *w_in,
        jnp.asarray(_UP_STACK, jnp.float32),
        jnp.asarray(_BANDS[2], jnp.float32),
        jnp.asarray(_BANDS[3], jnp.float32),
        tile_rows(packed["b"]),
        tile_rows(packed["a"]),
        tile_rows(packed["ib"]),
    )
    y_m = y_m[:, :, :gc]
    y = y_m.reshape(bsz // g, tk, g, c).transpose(0, 2, 1, 3).reshape(bsz, tk, c)

    e = t - tk
    rf = reach + 43  # boundary patch: effective reach + margin
    patch_n = e + rf
    slice_n = min(t, patch_n + rf + 64)
    tail_v = stage_reference(x[:, -slice_n:, :], packed, spec)[:, -patch_n:, :]
    y = jnp.concatenate([y[:, : t - patch_n, :], tail_v.astype(y.dtype)], axis=1)
    return y


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def stage_reference(x: jnp.ndarray, packed: dict, spec: StageSpec) -> jnp.ndarray:
    """Unfused XLA oracle on channels-last [B, T, C], from packed params.

    Mirrors AMPBlock1 chains (models/bigvgan.py AMPBlock1) but consumes the
    pre-materialised weights, so fused vs reference use identical numbers.
    """
    filt = jnp.asarray(_FILT)
    conv_i = 0
    act_i = 0
    acc = None
    for k, dils in zip(spec.kernel_sizes, spec.dilations):
        xb = x
        for d in dils:
            y = xb
            for which_d in (d, 1):
                # act
                a = packed["a"][:, act_i]
                ib = packed["ib"][:, act_i]
                act_i += 1
                u = upsample1d(y, filt, 2, 12)
                s = jnp.sin(u * a)
                v = u + ib * s * s
                y = downsample1d(v, filt, 2, 12)
                # conv (zero-pad same)
                w = jnp.transpose(packed["w"][conv_i], (0, 2, 1))  # [k, ci, co]
                b_ = packed["b"][:, conv_i]
                conv_i += 1
                pad = which_d * (k - 1) // 2
                y = (
                    jax.lax.conv_general_dilated(
                        y,
                        w.astype(y.dtype),
                        (1,),
                        [(pad, pad)],
                        rhs_dilation=(which_d,),
                        dimension_numbers=("NWC", "WIO", "NWC"),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    + b_
                )
            xb = xb + y
        acc = xb if acc is None else acc + xb
    return acc / len(spec.kernel_sizes)


@partial(jax.jit, static_argnames=("spec", "interpret", "tile_w"))
def fused_amp_stage(
    x: jnp.ndarray,
    packed: dict,
    spec: StageSpec,
    interpret: bool = False,
    tile_w: Optional[int] = None,
) -> jnp.ndarray:
    """[B, T, C] channels-last -> [B, T, C], one fused stage.

    Internally transposes to [B, C, T] ONCE each way (vs per-op in the
    unfused path), runs the Pallas kernel over the 128-aligned prefix and
    recomputes the ragged tail with the XLA oracle on a short slice.
    """
    bsz, t, c = x.shape
    H = 128  # > stage receptive field (96 at k<=11, d<=5), 128-aligned
    assert spec.receptive < H, "halo must cover the stage receptive field"
    W = tile_w or (2048 if x.dtype == jnp.bfloat16 else 1024)
    tk = t - t % 128

    # batch fold factor (see below) — needed for the VMEM estimate too
    g = 1
    for cand in range(min(bsz, 128 // c), 0, -1):
        if bsz % cand == 0:
            g = cand
            break
    gc_ = g * c
    n_convs = sum(2 * len(d) for d in spec.dilations)

    # VMEM guard: shrink the tile until the working set fits (Mosaic caps
    # VMEM at 16 MiB; leave headroom for its own spills). Working set =
    # input tile (dtype) + 5 f32 planes + output staging + block-diagonal
    # weights + 3 param-column arrays.
    def _vmem(w_lanes: int) -> int:
        wf = w_lanes + 2 * H
        isz = x.dtype.itemsize
        planes = gc_ * wf * (isz + 5 * 4) + gc_ * w_lanes * isz
        wbytes = sum(kk * gc_ * gc_ for kk in
                     [k for k, dl in zip(spec.kernel_sizes, spec.dilations)
                      for _ in dl for _ in range(2)]) * isz
        return planes + wbytes + 3 * gc_ * n_convs * 4

    budget = 13 * 1024 * 1024
    while W > 256 and _vmem(W) > budget:
        W //= 2
    rem = tk % W  # interior DMA windows need remainder 0 or >= H (halo)
    if 0 < rem < H:
        tk -= rem
    if _vmem(W) > budget or t < W + 128 or tk < W + 128:
        return stage_reference(x, packed, spec)

    # Fold g batch elements into the sublane (channel) axis so the per-tap
    # [C,C] matmuls fill the 128-wide MXU tile: [B,C,T] -> [B/g, g*C, T] is
    # a FREE reshape (row-major contiguous), weights become block-diagonal
    # kron(I_g, w). At C=24 this cuts padded MXU FLOPs ~4x; the block zeros
    # are the residual waste (g*C^2 logical vs (g*C)^2 padded per tap).
    x_cf = jnp.transpose(x, (0, 2, 1)).reshape(bsz // g, g * c, t)
    nt = pl.cdiv(tk, W)

    dtype = x.dtype
    Wf = W + 2 * H
    const3 = lambda b_, i_: (0, 0, 0)
    gc = g * c

    def blockdiag(w):  # [k, co, ci] -> [k, g*co, g*ci]
        if g == 1:
            return w
        eye = jnp.eye(g, dtype=w.dtype)
        kk = w.shape[0]
        return jnp.einsum("gh,koi->kgohi", eye, w).reshape(kk, gc, gc)

    def tile_cols(m):  # [c, n] -> [g*c, n]
        return jnp.tile(m, (g, 1)) if g > 1 else m

    y_cf = pl.pallas_call(
        partial(_kernel, spec=spec, W=W, H=H, t=tk, nt=nt),
        out_shape=jax.ShapeDtypeStruct((bsz // g, gc, tk), dtype),
        grid=(bsz // g, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        + [
            pl.BlockSpec((kk, gc, gc), const3, memory_space=pltpu.VMEM)
            for kk in [
                k
                for k, dils in zip(spec.kernel_sizes, spec.dilations)
                for _ in dils
                for _ in range(2)
            ]
        ]
        + [
            pl.BlockSpec(
                (gc, n_convs), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (gc, n_convs), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (gc, n_convs), lambda b_, i_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((gc, Wf), dtype),  # scratch (input tile)
            pltpu.VMEM((gc, Wf), jnp.float32),  # acc
            pltpu.VMEM((gc, Wf), jnp.float32),  # xb
            pltpu.VMEM((gc, Wf), jnp.float32),  # t1
            pltpu.VMEM((gc, Wf), jnp.float32),  # pe
            pltpu.VMEM((gc, Wf), jnp.float32),  # po
            pltpu.VMEM((gc, W), dtype),  # ob (output staging, dtype-cast)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        x_cf,
        *[blockdiag(w).astype(dtype) for w in packed["w"]],
        tile_cols(packed["b"]),
        tile_cols(packed["a"]),
        tile_cols(packed["ib"]),
    )
    y = jnp.transpose(y_cf.reshape(bsz, c, tk), (0, 2, 1))  # [B, tk, C]

    e = t - tk
    rf = spec.receptive + 16
    patch_n = e + rf  # trailing rows to recompute exactly
    slice_n = min(t, patch_n + rf + 64)
    tail = stage_reference(x[:, -slice_n:, :], packed, spec)[:, -patch_n:, :]
    y = jnp.concatenate([y[:, : t - patch_n, :], tail.astype(y.dtype)], axis=1)
    return y
