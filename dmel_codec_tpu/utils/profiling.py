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
