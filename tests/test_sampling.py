"""Sampling: golden parity with reference utils/utils.py:104-155 and
sparse-top-k vs dense-path equivalence (the serving path never sorts the
full 151936 vocab; it must still produce the same distribution)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import tests.reference_import  # noqa: F401

from dmel_codec_tpu.lm.sampling import logits_to_probs, sample_token


def _stub_lightning_utilities():
    """reference utils/utils.py pulls RankedLogger -> lightning_utilities
    (absent here); shim just the two rank-zero helpers it touches."""
    import sys
    import types

    if "lightning_utilities" in sys.modules:
        return
    rank_zero = types.ModuleType("lightning_utilities.core.rank_zero")
    rank_zero.rank_prefixed_message = lambda msg, rank: msg
    rank_zero.rank_zero_only = types.SimpleNamespace(rank=0)
    core = types.ModuleType("lightning_utilities.core")
    root = types.ModuleType("lightning_utilities")
    core.rank_zero = rank_zero
    root.core = core
    sys.modules["lightning_utilities"] = root
    sys.modules["lightning_utilities.core"] = core
    sys.modules["lightning_utilities.core.rank_zero"] = rank_zero


_stub_lightning_utilities()


def _ref_probs(logits, previous=None, temperature=1.0, top_k=50, top_p=1.0,
               penalty=1.0):
    from dmel_codec.utils.utils import logits_to_probs as ref

    t = torch.from_numpy(np.asarray(logits, np.float32).copy())
    prev = None if previous is None else torch.from_numpy(np.asarray(previous))
    return ref(
        t, previous_tokens=prev, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=penalty,
    ).numpy()


@pytest.mark.parametrize(
    "top_k,top_p,temperature",
    [(50, 0.7, 0.7), (50, 1.0, 1.0), (0, 0.8, 0.7), (1, 0.7, 0.7)],
)
def test_probs_match_reference(rng, top_k, top_p, temperature):
    logits = rng.standard_normal(2000).astype(np.float32) * 3
    want = _ref_probs(logits, None, temperature, top_k, top_p)
    got = logits_to_probs(
        jnp.asarray(logits), temperature=temperature, top_k=top_k, top_p=top_p
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_probs_with_penalty_match_reference(rng):
    logits = rng.standard_normal(2000).astype(np.float32) * 3
    window = rng.choice(2000, size=16, replace=False)  # unique: torch
    # scatter_ with duplicate indices is nondeterministic
    want = _ref_probs(logits, window, 0.7, 50, 0.7, penalty=1.2)
    got = logits_to_probs(
        jnp.asarray(logits),
        previous_tokens=jnp.asarray(window),
        previous_valid=jnp.ones(16, bool),
        temperature=0.7,
        top_k=50,
        top_p=0.7,
        repetition_penalty=1.2,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_sample_token_sparse_probs_match_dense(rng):
    """sample_token's sparse scatter probs == logits_to_probs dense result."""
    logits = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 3)
    window = jnp.asarray(rng.choice(4096, size=16, replace=False))
    valid = jnp.ones(16, bool)
    tok, probs = sample_token(
        jax.random.PRNGKey(0), logits, window, valid,
        temperature=0.7, top_k=50, top_p=0.7, repetition_penalty=1.2,
    )
    want = logits_to_probs(
        logits, window, valid, 0.7, 50, 0.7, 1.2
    )
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want), atol=1e-6)
    assert float(probs[tok]) > 0.0


def test_probs_keep_kth_ties_like_reference(rng):
    """Logits tied with the k-th largest value must survive top-k
    filtering (reference pivot semantics, utils/utils.py:119-127) — the
    sparse path must not silently keep exactly k entries."""
    logits = np.full(100, -5.0, np.float32)
    logits[:8] = 2.0  # 8-way tie; top_k=5 pivot == 2.0 keeps all 8
    want = _ref_probs(logits, None, 1.0, 5, 1.0)
    got = logits_to_probs(jnp.asarray(logits), temperature=1.0, top_k=5, top_p=1.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    assert int((np.asarray(got) > 0).sum()) == 8


def test_sample_token_reaches_beyond_topk_ties(rng):
    """With an 8-way tie at the pivot and top_k=5, every tied token must
    be reachable (the dense reference keeps all 8), each ~uniformly."""
    logits = np.full(64, -9.0, np.float32)
    logits[10:18] = 1.5
    seen = set()
    for i in range(120):
        tok, _ = sample_token(
            jax.random.PRNGKey(i), jnp.asarray(logits), top_k=5, top_p=1.0,
            temperature=1.0,
        )
        seen.add(int(tok))
    assert seen == set(range(10, 18)), seen


def test_sample_token_greedy_is_argmax(rng):
    logits = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    tok, _ = sample_token(jax.random.PRNGKey(1), logits, top_k=1)
    assert int(tok) == int(jnp.argmax(logits))


def test_sample_token_respects_topk_support(rng):
    """Every sampled token must be inside the top-k set."""
    logits = jnp.asarray(rng.standard_normal(500).astype(np.float32))
    top = set(np.asarray(jax.lax.top_k(logits, 10)[1]).tolist())
    for i in range(20):
        tok, _ = sample_token(
            jax.random.PRNGKey(i), logits, top_k=10, top_p=0.9
        )
        assert int(tok) in top
