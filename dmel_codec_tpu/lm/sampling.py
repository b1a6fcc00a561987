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


def _sparse_filtered_logits(
    logits: jnp.ndarray, top_k: int, top_p: float
) -> jnp.ndarray:
    """Dense [V] logits with everything outside top-k/top-p set to -inf,
    WITHOUT a full-vocabulary sort (the slow vocab is 151936; a dense
    sort-per-token dominated serving sampling cost).

    Matches the reference's top-k pivot semantics (utils/utils.py:119-127:
    `logits < kth -> -inf` keeps values TIED with the k-th); once top-k
    filtering has run, the top-p cutoff is computable from the k largest
    values alone.

    Nucleus ties are VALUE-based by design, here and in the dense path
    below: every logit equal to the boundary value is kept, where the
    reference removes by sorted position (an arbitrary subset of equal
    values survives, depending on sort order). Reachable with bf16 or
    quantized logits; value-keep is the deterministic, permutation-
    invariant semantics this library intends. A second, narrower
    divergence: with ties straddling BOTH position k and the nucleus
    boundary, the cutoff is derived from exactly k entries rather than
    k+ties."""
    vals, _ = jax.lax.top_k(logits, top_k)
    logits = jnp.where(logits < vals[-1], -jnp.inf, logits)
    if top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(vals))
        keep = (cum <= top_p) | (jnp.arange(vals.shape[-1]) == 0)
        cutoff = jnp.min(jnp.where(keep, vals, jnp.inf))
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


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
        # sparse path: cutoffs from the top-k values, dense elementwise
        # filtering (keeps k-th ties like the reference), no [V] sort
        filtered = _sparse_filtered_logits(logits, top_k, top_p)
        return jax.nn.softmax(filtered / max(temperature, 1e-5))

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
        # Sparse draw, tie-exact: the class draw happens in the [K] space
        # (a dense [V] categorical measurably slowed the serving loop),
        # with the cutoff-tied class's weight folded up by its FULL dense
        # multiplicity; only when ties extend beyond the top-k does a
        # lax.cond fall back to a dense uniform tie-break. Distribution is
        # exactly the reference's softmax over {logits >= cutoff}.
        temp = max(temperature, 1e-5)
        vals, idx = jax.lax.top_k(logits, top_k)  # desc
        if top_p < 1.0:
            cum = jnp.cumsum(jax.nn.softmax(vals))
            keep = (cum <= top_p) | (jnp.arange(top_k) == 0)
            cutoff = jnp.min(jnp.where(keep, vals, jnp.inf))
        else:
            cutoff = vals[-1]
        tied = vals == cutoff
        m_in = jnp.maximum(tied.sum(), 1)
        m_total = jnp.maximum((logits == cutoff).sum(), m_in)
        scaled = jnp.where(vals < cutoff, -jnp.inf, vals) / temp
        scaled = jnp.where(
            tied,
            scaled + jnp.log(m_total.astype(jnp.float32) / m_in),
            scaled,
        )
        rng, r_class, r_tie = jax.random.split(rng, 3)
        choice = jax.random.categorical(r_class, scaled)
        token_fast = idx[choice].astype(jnp.int32)

        def dense_tie_break(_):
            u = jax.random.uniform(r_tie, logits.shape)
            return jnp.argmax(
                jnp.where(logits == cutoff, u, -1.0)
            ).astype(jnp.int32)

        token = jax.lax.cond(
            (m_total > m_in) & (vals[choice] == cutoff),
            dense_tie_break,
            lambda _: token_fast,
            None,
        )
        probs = jax.nn.softmax(
            jnp.where(logits < cutoff, -jnp.inf, logits) / temp
        )  # dense + tie-exact; dead-code-eliminated when callers drop it
        return token, probs

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
