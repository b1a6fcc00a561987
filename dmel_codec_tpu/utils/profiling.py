"""Profiling helpers (SURVEY section 5: the reference has none; jax.profiler
traces are the idiomatic TPU observability layer)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace of the enclosed block.

        with trace("tb_logs/profile"):
            state, metrics = train_step(state, batch, rng)
            jax.block_until_ready(state)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # named host-side trace spans


def sync(tree) -> None:
    """Force TRUE completion of every array in `tree`.

    On remote-device tunnels (e.g. the axon relay used on 1-chip dev
    hosts) `jax.block_until_ready` can acknowledge before the device has
    finished executing, which silently breaks wall-clock timing loops. A
    device->host fetch of a value cannot complete early, so reducing each
    leaf to a scalar and pulling it to the host is a reliable barrier.
    Use this (not block_until_ready) around anything you time."""
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            float(jnp.mean(leaf.astype(jnp.float32)))
        elif hasattr(leaf, "dtype"):
            int(jnp.max(leaf.astype(jnp.int32)))


def timed_rep(make_dep, x0, iters: int = 10, consts=None) -> float:
    """Seconds per op, trustworthy on remote-device tunnels.

    `make_dep(carry) -> scalar float32` must DEPEND on the carry (usually
    `jnp.mean(op(carry).astype(jnp.float32))`). The op is repeated inside
    ONE jit via lax.fori_loop — each iteration's input is re-derived from
    the previous dep through a 1e-20 scale (nonzero, so XLA's algebraic
    simplifier cannot fold the dependency away; numerically a no-op) —
    and two loop lengths are differenced so dispatch/tunnel overhead
    cancels. The closing device->host fetch cannot complete before the
    whole chain has executed (unlike block_until_ready here — see sync).

    `consts`: optional pytree handed to `make_dep(carry, consts)` as a JIT
    ARGUMENT. Big weight trees MUST go here, not into make_dep's closure —
    closed-over arrays are baked into the MLIR as constants, and a 0.5 B
    parameter module reliably kills the remote-compile helper.
    """
    import time

    import jax.numpy as jnp

    def rep(n):
        def body(c):
            def _b(i, carry):
                x, acc = carry
                dep = make_dep(x) if c is None else make_dep(x, c)
                return (x0 + (1e-20 * dep).astype(x0.dtype), acc + dep)

            return _b

        f = jax.jit(
            lambda a, c: jax.lax.fori_loop(0, n, body(c), (a, jnp.float32(0)))[1]
        )
        float(f(x0, consts))  # warm + sync
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(f(x0, consts))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(rep(2 + iters) - rep(2), 1e-9) / iters


@contextlib.contextmanager
def timed(label: str, results: dict | None = None) -> Iterator[None]:
    """Wall-clock a block (remember jax is async — block_until_ready inside)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if results is not None:
            results[label] = dt
