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
