"""Fused anti-alias activation kernel vs the unfused oracle (interpret mode).

The Pallas kernel runs in interpreter mode on the CPU test platform; the
compiled path is exercised on real TPU by bench.py / the driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmel_codec_tpu.ops.anti_alias import (
    anti_alias_activation_reference,
    fused_anti_alias_activation,
)

ATOL = 1e-5


@pytest.mark.parametrize("t,c", [(64, 16), (100, 24), (256, 8), (96, 130)])
def test_fused_matches_oracle_snakebeta(rng, t, c):
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    want = anti_alias_activation_reference(x, alpha, beta, logscale=True)
    got = fused_anti_alias_activation(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_fused_matches_oracle_snake(rng):
    x = jnp.asarray(rng.standard_normal((1, 80, 12)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(12).astype(np.float32) * 0.3 + 1.0)
    want = anti_alias_activation_reference(x, alpha, None, logscale=False)
    got = fused_anti_alias_activation(x, alpha, None, False, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_fused_short_input_falls_back(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 4)).astype(np.float32))
    alpha = jnp.ones(4)
    beta = jnp.ones(4)
    want = anti_alias_activation_reference(x, alpha, beta, False)
    got = fused_anti_alias_activation(x, alpha, beta, False, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_fast_sin_accuracy(rng):
    """The kernel's polynomial sin must stay well inside the fused-vs-
    oracle tolerance across the realistic activation range."""
    from dmel_codec_tpu.ops.anti_alias import _fast_sin

    x = rng.uniform(-50, 50, 100000).astype(np.float32)
    got = np.asarray(_fast_sin(jnp.asarray(x)))
    want = np.sin(x.astype(np.float64))
    assert np.abs(got - want).max() < 1e-5
    # tighter in the typical |alpha*x| < 10 range
    x = rng.uniform(-10, 10, 100000).astype(np.float32)
    got = np.asarray(_fast_sin(jnp.asarray(x)))
    assert np.abs(got - np.sin(x.astype(np.float64))).max() < 1.5e-6


def test_fused_batch_merge_matches_oracle(rng):
    """C < 128 with B > 1 exercises the [B,T,C] -> [T,B*C] lane-merged
    kernel path; per-channel alpha/beta must land on the right lanes."""
    x = jnp.asarray(rng.standard_normal((4, 300, 24)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.3)
    want = anti_alias_activation_reference(x, alpha, beta, logscale=True)
    got = fused_anti_alias_activation(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


@pytest.mark.parametrize("t,c", [(300, 24), (96, 130)])
def test_fused_bf16_error_bounded(rng, t, c):
    """bf16 serving (the production path) runs the FIR matmuls with
    bf16-rounded taps and bf16 snake intermediates; bound that error
    against the f32 oracle so a precision regression is caught."""
    x32 = rng.standard_normal((4, t, c)).astype(np.float32)
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    want = np.asarray(
        anti_alias_activation_reference(jnp.asarray(x32), alpha, beta, True)
    )
    got = np.asarray(
        fused_anti_alias_activation(
            jnp.asarray(x32, jnp.bfloat16), alpha, beta, True, True
        )
    ).astype(np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.03 * scale


def test_fused_gradients_match_oracle(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 8)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.2)
    beta = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.2)

    def loss_fused(x_, a_, b_):
        return fused_anti_alias_activation(x_, a_, b_, True, True).sum()

    def loss_ref(x_, a_, b_):
        return anti_alias_activation_reference(x_, a_, b_, True).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, alpha, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, alpha, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("t", [4032, 8064])  # single-tile / multi-tile segments
def test_fused_segmented_contig_matches_oracle(rng, t, monkeypatch):
    """Merged single-batch inputs run as [nseg, T/nseg, L] contiguous
    segments with cross-segment halo DMAs; output must equal the oracle
    exactly incl. at interior segment boundaries."""
    import dmel_codec_tpu.ops.anti_alias as A

    monkeypatch.setattr(A, "_SEG_MIN_T", 256)
    c = 128  # direct path (no lane merge), b=1 triggers segmentation
    x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    itemsize = 4
    nseg = A._plan_segments(1, t, c, itemsize)
    assert nseg > 1, "shape must actually exercise the segmented path"
    want = anti_alias_activation_reference(x, alpha, beta, logscale=True)
    got = fused_anti_alias_activation(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)
