"""LR schedules as optax-compatible callables.

Parity with reference utils/schedule.py:4-25 (cosine with warmup and a
final-ratio floor), expressed on traced step counts so the whole schedule
lives inside the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int | float,
    num_training_steps: int,
    num_cycles: float = 0.5,
    final_lr_ratio: float = 0.0,
):
    """Returns schedule(step) -> lr. Matches the reference lambda exactly,
    including float-valued warmup interpreted as a fraction of total steps."""
    if 0 < num_warmup_steps < 1:
        num_warmup_steps = int(num_warmup_steps * num_training_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        cosine = jnp.maximum(
            final_lr_ratio,
            0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)),
        )
        return base_lr * jnp.where(step < num_warmup_steps, warmup, cosine)

    return schedule
