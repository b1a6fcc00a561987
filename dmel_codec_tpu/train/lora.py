"""LoRA adapters for LM finetuning.

The reference declares LoRA-only checkpoint filtering
(`lm_lit_modules.py:371-381`: with `use_lora`, `on_save_checkpoint` keeps
only state-dict keys containing "lora") but contains no LoRA layers — the
flag is aspirational. This module supplies a real implementation, done
the JAX way: adapters live in a SEPARATE parameter tree and the merged
weights `W + (alpha/rank) * A @ B` are computed functionally before
`model.apply`, so the model code is untouched, gradients flow only into
the adapter tree, and "LoRA-only checkpoints" are simply checkpoints of
that tree (`train/checkpoint.py` works on it unchanged).

Default targets: the attention projections (q/k/v/o) of both the slow and
fast decoders — the standard LoRA recipe (Hu et al. 2021).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = r"self_attn/(q|k|v|o)_proj/kernel$"


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    # regex matched against the "/"-joined parameter path
    targets: str = DEFAULT_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _iter_target_paths(params, pattern: str):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rx = re.compile(pattern)
    for path, leaf in flat:
        name = "/".join(k.key for k in path)
        if rx.search(name) and leaf.ndim == 2:
            yield name, leaf


def init_lora(rng: jax.Array, params, config: LoRAConfig) -> Dict[str, Any]:
    """Adapter tree {path: {"a": [in, r], "b": [r, out]}}. `a` gets a
    scaled-normal init, `b` zeros, so the merged model starts EXACTLY at
    the base model (standard LoRA init)."""
    lora: Dict[str, Any] = {}
    for name, leaf in _iter_target_paths(params, config.targets):
        rng, r = jax.random.split(rng)
        d_in, d_out = leaf.shape
        lora[name] = {
            "a": (jax.random.normal(r, (d_in, config.rank), leaf.dtype)
                  * (1.0 / max(d_in, 1) ** 0.5)),
            "b": jnp.zeros((config.rank, d_out), leaf.dtype),
        }
    if not lora:
        raise ValueError(f"no parameters matched LoRA targets {config.targets!r}")
    return lora


def merge_lora(params, lora: Dict[str, Any], config: LoRAConfig):
    """params with W := W + scale * a @ b at every adapted leaf (pure)."""
    scale = config.scale

    def fn(path, leaf):
        name = "/".join(k.key for k in path)
        ab = lora.get(name)
        if ab is None:
            return leaf
        return leaf + scale * (ab["a"] @ ab["b"]).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fn, params)


def lora_param_count(lora: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))


def loss_and_grads_lora(loss_fn, base_params, lora, config: LoRAConfig, *args):
    """value_and_grad of `loss_fn(merged_params, *args)` with respect to
    the ADAPTER tree only (the base stays frozen — no base-sized grads)."""

    def f(lora_):
        return loss_fn(merge_lora(base_params, lora_, config), *args)

    return jax.value_and_grad(f, has_aux=True)(lora)
