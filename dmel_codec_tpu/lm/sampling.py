"""Token sampling: repetition penalty -> top-k -> top-p -> temperature.

Parity with reference utils/utils.py:82-161 (same order of operations:
penalty on raw logits over the previous-token window, top-k floor, top-p
nucleus on the UN-tempered logits, then temperature + softmax + sample).
All static-shape / jit-friendly; the window is fixed-size with a validity
mask instead of the reference's variable slice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def apply_repetition_penalty(
    logits: jnp.ndarray,
    previous_tokens: jnp.ndarray,
    valid: jnp.ndarray,
    penalty: float,
) -> jnp.ndarray:
    """logits [V]; previous_tokens [W] int; valid [W] bool.

    Implemented as a boolean max-scatter + select: a value scatter with
    duplicate indices (a token both in a valid and an invalid window slot)
    would pick an arbitrary winner."""
    prev = previous_tokens.astype(jnp.int32)
    hit = jnp.zeros(logits.shape, bool).at[prev].max(valid)
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(hit, penalized, logits)


def _top_p_filter_sorted(vals: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filter over DESC-sorted logits [K]: drop entries outside the
    smallest prefix whose softmax mass reaches top_p (first always kept)."""
    cum = jnp.cumsum(jax.nn.softmax(vals))
    keep = (cum <= top_p) | (jnp.arange(vals.shape[-1]) == 0)
    cutoff = jnp.min(jnp.where(keep, vals, jnp.inf))
    return jnp.where(vals < cutoff, -jnp.inf, vals)


def _topk_filtered(
    logits: jnp.ndarray, top_k: int, top_p: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(filtered top-k logits [K] desc, their vocab indices [K]).

    Once top-k filtering has run, every surviving logit is one of the k
    largest, so the top-p cutoff is computable from those k values alone —
    no full-vocabulary sort (the slow vocab is 151936; a dense
    sort-per-token dominated serving sampling cost)."""
    vals, idx = jax.lax.top_k(logits, top_k)
    if top_p < 1.0:
        vals = _top_p_filter_sorted(vals, top_p)
    return vals, idx


def logits_to_probs(
    logits: jnp.ndarray,
    previous_tokens: Optional[jnp.ndarray] = None,
    previous_valid: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    top_k: int = 50,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
) -> jnp.ndarray:
    """logits [V] -> probs [V]."""
    if previous_tokens is not None and repetition_penalty != 1.0:
        if previous_valid is None:
            previous_valid = jnp.ones(previous_tokens.shape, bool)
        logits = apply_repetition_penalty(
            logits, previous_tokens, previous_valid, repetition_penalty
        )

    if top_k > 0 and top_k < logits.shape[-1]:
        # sparse path: all work in the [K] space, one scatter back to [V]
        vals, idx = _topk_filtered(logits, top_k, top_p)
        probs_k = jax.nn.softmax(vals / max(temperature, 1e-5))
        return jnp.zeros_like(logits).at[idx].set(probs_k)

    if top_p < 1.0:
        sorted_logits = jnp.sort(logits)[::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits))
        # threshold = smallest kept logit (first position always kept)
        keep = (cum <= top_p) | (jnp.arange(logits.shape[-1]) == 0)
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf))
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)

    logits = logits / max(temperature, 1e-5)
    return jax.nn.softmax(logits, axis=-1)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,
    previous_tokens: Optional[jnp.ndarray] = None,
    previous_valid: Optional[jnp.ndarray] = None,
    temperature: float = 0.7,
    top_k: int = 50,
    top_p: float = 0.7,
    repetition_penalty: float = 1.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (token id scalar int32, probs [V])."""
    if previous_tokens is not None and repetition_penalty != 1.0:
        if previous_valid is None:
            previous_valid = jnp.ones(previous_tokens.shape, bool)
        logits = apply_repetition_penalty(
            logits, previous_tokens, previous_valid, repetition_penalty
        )
        previous_tokens = None  # already applied

    if top_k > 0 and top_k < logits.shape[-1]:
        # draw in the [K] space — the dense [V] softmax/sort never happens
        vals, idx = _topk_filtered(logits, top_k, top_p)
        scaled = vals / max(temperature, 1e-5)
        choice = jax.random.categorical(rng, scaled)
        token = idx[choice]
        probs = jnp.zeros_like(logits).at[idx].set(jax.nn.softmax(scaled))
        return token.astype(jnp.int32), probs

    probs = logits_to_probs(
        logits,
        previous_tokens,
        previous_valid,
        temperature,
        top_k,
        top_p,
        repetition_penalty,
    )
    token = jax.random.categorical(rng, jnp.log(jnp.maximum(probs, 1e-30)))
    return token.astype(jnp.int32), probs
