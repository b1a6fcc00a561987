"""Fused channels-first AMP stage kernel vs the unfused module chain.

The kernel (ops/stage_fused.py) must reproduce the whole resblock group of
a BigVGAN upsample stage — 3 parallel AMPBlock1 chains averaged — exactly,
including the replicate/zero edge semantics, for every tail channel count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmel_codec_tpu.models.bigvgan import AMPBlock1
from dmel_codec_tpu.ops.stage_fused import (
    StageSpec,
    fused_amp_stage,
    fused_amp_stage_v2,
    pack_stage,
    stage_reference,
)

IMPLS = {"v1": fused_amp_stage, "v2": fused_amp_stage_v2}


def _make_stage(c: int, rng_seed: int = 0):
    spec = StageSpec(channels=c)
    rng = jax.random.PRNGKey(rng_seed)
    params = []
    x0 = jnp.zeros((1, 64, c))
    for i, (k, dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
        blk = AMPBlock1(
            channels=c,
            kernel_size=k,
            dilation=tuple(dils),
            activation=spec.activation,
            logscale=spec.logscale,
        )
        p = blk.init(jax.random.fold_in(rng, i), x0)["params"]
        # non-trivial alphas/betas (zeros-init logscale -> all alpha=1)
        p = jax.tree_util.tree_map(
            lambda a: a
            + 0.05 * jax.random.normal(jax.random.fold_in(rng, hash(a.shape) % 97), a.shape),
            p,
        )
        params.append(p)
    return spec, params


def _unfused(spec, params, x):
    acc = None
    for i, (k, dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
        blk = AMPBlock1(
            channels=spec.channels,
            kernel_size=k,
            dilation=tuple(dils),
            activation=spec.activation,
            logscale=spec.logscale,
        )
        y = blk.apply({"params": params[i]}, x)
        acc = y if acc is None else acc + y
    return acc / len(spec.kernel_sizes)


@pytest.mark.parametrize("c", [24, 48, 96])
def test_reference_matches_modules(c):
    """stage_reference (packed-weight oracle) == the flax module chain."""
    spec, params = _make_stage(c)
    packed = pack_stage(params, spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 400, c), jnp.float32)
    ref = _unfused(spec, params, x)
    got = stage_reference(x, packed, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["v1", "v2"])
@pytest.mark.parametrize("c", [24, 96])
@pytest.mark.parametrize("t", [2048, 2000])  # aligned + ragged tail
def test_fused_matches_reference(impl, c, t):
    spec, params = _make_stage(c)
    packed = pack_stage(params, spec)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, t, c), jnp.float32)
    ref = stage_reference(x, packed, spec)
    got = IMPLS[impl](x, packed, spec, interpret=True, tile_w=512)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    # polynomial sin in the kernel: abs err < 4e-6 per act, ~36 ops chained
    assert err.max() < 5e-4, f"max err {err.max():.2e} at {np.unravel_index(err.argmax(), err.shape)}"


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_fused_edge_exactness(impl):
    """First/last samples (replicate + zero pad paths) must match too."""
    c = 24
    spec, params = _make_stage(c, rng_seed=3)
    packed = pack_stage(params, spec)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 1664, c), jnp.float32)
    ref = stage_reference(x, packed, spec)
    got = IMPLS[impl](x, packed, spec, interpret=True, tile_w=512)
    head_err = np.abs(np.asarray(got)[:, :32] - np.asarray(ref)[:, :32]).max()
    tail_err = np.abs(np.asarray(got)[:, -32:] - np.asarray(ref)[:, -32:]).max()
    assert head_err < 5e-4, f"head err {head_err:.2e}"
    assert tail_err < 5e-4, f"tail err {tail_err:.2e}"


@pytest.mark.parametrize(
    "t,c,dtype",
    [
        (1024, 192, "f32"),  # tap-granularity stream (f32 conv-stack > cap)
        (2000, 192, "f32"),  # ... with a ragged tail
        (1024, 192, "bf16"),  # conv-granularity stream (2.9 MB wbuf fits)
        (1024, 384, "f32"),  # tap stream at L=384 (s1 shape class)
    ],
)
def test_fused_v2_streaming_weights_matches_reference(t, c, dtype):
    """gc > 128 dispatches a streaming-weights kernel branch (ref
    unpacking, 2-slot DMA rotation, schedule/compute order coupling) —
    parity incl. ragged tails and both edges, at BOTH stream granularities
    (per-conv [k,L,L] stacks and per-(block,tap) [L,L] matrices). s2
    (C=192) and s1 (C=384) are the production shape classes."""
    from dmel_codec_tpu.ops import stage_fused as sf

    spec, params = _make_stage(c, rng_seed=5)
    packed = pack_stage(params, spec)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, t, c), jnp.float32)
    ref = stage_reference(x, packed, spec)
    tol = 5e-4
    if dtype == "bf16":
        x = x.astype(jnp.bfloat16)
        tol = 1.2e-1  # bf16 weights + bf16 inter-op planes vs f32 oracle
    got = fused_amp_stage_v2(x, packed, spec, interpret=True, tile_w=512)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
    assert err.max() < tol, f"max err {err.max():.2e}"
    # replicate/zero edge semantics at both boundaries
    head_err = err[:, :32].max()
    tail_err = err[:, -32:].max()
    assert head_err < tol, f"head err {head_err:.2e}"
    assert tail_err < tol, f"tail err {tail_err:.2e}"


def test_bigvgan_apply_fused_matches_module():
    """Full-vocoder fused forward == BigVGAN.apply on the same param tree."""
    from dmel_codec_tpu.models.bigvgan import (
        BigVGAN,
        BigVGANConfig,
        bigvgan_apply_fused,
    )

    cfg = BigVGANConfig(
        num_mels=8,
        upsample_initial_channel=96,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        use_pallas_kernel=False,
    )
    model = BigVGAN(config=cfg)
    mel = jax.random.normal(jax.random.PRNGKey(7), (2, 600, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(8), mel[:1, :8])["params"]
    ref = model.apply({"params": params}, mel)
    got = bigvgan_apply_fused(
        params, mel, cfg, fuse_max_channels=96, tile_w=512, interpret=True
    )
    assert got.shape == ref.shape
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 5e-4, f"max err {err:.2e}"
