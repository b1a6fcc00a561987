"""Qwen2-style decoder-only transformer, built from scratch for JAX.

Capability parity with the HF `Qwen2Model` the reference builds on
(models/modules/lm.py:8, config at config/lm/slow_lm_0.5B.json /
fast_lm.json): pre-RMSNorm blocks, RoPE (theta 1e6), grouped-query
attention with Q/K/V biases and bias-free output projection, SiLU gated
MLP, final RMSNorm.

TPU-first:
  * KV cache is an explicit pytree of static-shape arrays — decode steps
    jit to a single fused program, cache donated between steps
  * attention is einsum-based with f32 softmax; GQA expands KV heads by
    broadcast-reshape (no materialised repeat until the einsum)
  * no data-dependent control flow; masks carry validity
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    # scan_layers: one traced layer body instead of num_layers copies —
    # ~L-times less HLO to compile; params stack on a leading layer axis
    # under a single 'layers' collection
    scan_layers: bool = False
    # remat: rematerialise each block in the backward pass (activation
    # memory ~ O(sqrt) instead of O(L) — jax.checkpoint per layer)
    remat: bool = False
    # flash_attention: use the Pallas TPU flash kernel on the cache-less
    # (training) path for sequences >= flash_min_seq — O(S) memory instead
    # of the materialised [S, S] score matrix. TPU-only.
    flash_attention: bool = False
    flash_min_seq: int = 512

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# Flagship sizes (config/lm/slow_lm_0.5B.json:8-26, fast_lm.json:4-24).
SLOW_LM_CONFIG = TransformerConfig(
    vocab_size=151936,
    hidden_size=896,
    intermediate_size=4864,
    num_layers=24,
    num_heads=14,
    num_kv_heads=2,
)
FAST_LM_CONFIG = TransformerConfig(
    vocab_size=1800,
    hidden_size=480,
    intermediate_size=2880,
    num_layers=12,
    num_heads=10,
    num_kv_heads=2,
)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (weight * y).astype(x.dtype)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [..., S] -> cos/sin [..., S, head_dim] (HF half-duplicated)."""
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, hd/2]
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, hd]; cos/sin [B, S, hd] (broadcast over heads)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[..., None, :] + rotated * sin[..., None, :]


def init_kv_cache(
    config: TransformerConfig, batch: int, max_len: int, dtype=jnp.float32
):
    """Static-shape cache: per-layer K/V [L, B, max_len, kv_heads, head_dim]."""
    shape = (config.num_layers, batch, max_len, config.num_kv_heads, config.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "index": jnp.zeros((), jnp.int32),
    }


class Attention(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        mask: jnp.ndarray,
        cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        mask_is_causal: bool = False,
    ):
        cfg = self.config
        b, s, _ = x.shape
        hd = cfg.head_dim

        q = nn.Dense(cfg.num_heads * hd, name="q_proj")(x)
        k = nn.Dense(cfg.num_kv_heads * hd, name="k_proj")(x)
        v = nn.Dense(cfg.num_kv_heads * hd, name="v_proj")(x)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_kv_heads, hd)
        v = v.reshape(b, s, cfg.num_kv_heads, hd)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_kv = None
        if cache_kv is not None:
            ck, cv = cache_kv  # [B, max_len, kh, hd]
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
            new_kv = (ck, cv)

        if (
            cfg.flash_attention
            and cache_kv is None
            and s >= cfg.flash_min_seq
            and mask_is_causal  # a caller-supplied mask must use the einsum path
        ):
            out = _flash_causal_attention(q, k, v, cfg)
            out = nn.Dense(cfg.num_heads * hd, use_bias=False, name="o_proj")(
                out.reshape(b, s, -1)
            )
            return out, None

        groups = cfg.num_heads // cfg.num_kv_heads
        t = k.shape[1]
        # GQA: [B, T, kh, hd] -> heads via an extra group axis in the einsum.
        qg = q.reshape(b, s, cfg.num_kv_heads, groups, hd)
        scores = jnp.einsum("bskgh,btkh->bkgst", qg, k) / np.sqrt(hd)
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bkgst,btkh->bskgh", probs, v).reshape(b, s, -1)
        out = nn.Dense(cfg.num_heads * hd, use_bias=False, name="o_proj")(out)
        return out, new_kv


def _flash_causal_attention(q, k, v, cfg: TransformerConfig):
    """Pallas TPU flash attention over [B, S, H, hd] inputs (causal).

    GQA KV heads are expanded to full heads; sequence is zero-padded to a
    128 multiple (tail keys are never attended by live queries under the
    causal mask)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    b, s, nh, hd = q.shape
    groups = cfg.num_heads // cfg.num_kv_heads
    k = jnp.repeat(k, groups, axis=2)
    v = jnp.repeat(v, groups, axis=2)
    pad = (-s) % 128
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    # flash kernel layout [B, H, S, hd]
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=True,
        sm_scale=1.0 / float(np.sqrt(hd)),
    )
    out = out.transpose(0, 2, 1, 3)
    return out[:, :s]


class MLP(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        gate = nn.Dense(cfg.intermediate_size, use_bias=False, name="gate_proj")(x)
        up = nn.Dense(cfg.intermediate_size, use_bias=False, name="up_proj")(x)
        return nn.Dense(cfg.hidden_size, use_bias=False, name="down_proj")(
            nn.silu(gate) * up
        )


class Block(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(
        self, x, cos, sin, mask, cache_kv=None, cache_index=None, mask_is_causal=False
    ):
        attn_out, new_kv = Attention(self.config, name="self_attn")(
            RMSNorm(self.config.rms_norm_eps, name="input_layernorm")(x),
            cos,
            sin,
            mask,
            cache_kv,
            cache_index,
            mask_is_causal,
        )
        x = x + attn_out
        x = x + MLP(self.config, name="mlp")(
            RMSNorm(self.config.rms_norm_eps, name="post_attention_layernorm")(x)
        )
        return x, new_kv


class Decoder(nn.Module):
    """Stack of blocks + final norm over input EMBEDDINGS (no token table —
    the multimodal models own their embeddings, as the reference's
    Qwen2Model subclasses replace embed_tokens)."""

    config: TransformerConfig

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,
        cache: Optional[dict] = None,
        attn_mask: Optional[jnp.ndarray] = None,
    ):
        """inputs_embeds [B, S, H]. Without cache: causal self-attention.
        With cache: S new tokens appended at cache['index']; attention over
        all cached positions <= current. Returns (hidden, new_cache)."""
        cfg = self.config
        b, s, _ = inputs_embeds.shape

        mask_is_causal = False
        if cache is None:
            if positions is None:
                positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
            if attn_mask is None:
                mask_is_causal = True
                causal = jnp.tril(jnp.ones((s, s), bool))
                attn_mask = jnp.broadcast_to(causal, (b, s, s))
            cache_index = None
        else:
            cache_index = cache["index"]
            if positions is None:
                positions = jnp.broadcast_to(
                    cache_index + jnp.arange(s)[None, :], (b, s)
                )
            max_len = cache["k"].shape[2]
            key_pos = jnp.arange(max_len)[None, None, :]  # [1, 1, T]
            attn_mask = key_pos <= positions[:, :, None]  # [B, S, T]

        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

        x = inputs_embeds
        block_cls = nn.remat(Block, static_argnums=()) if cfg.remat else Block

        if cfg.scan_layers:
            x, stacked_kv = self._scan_layers(
                block_cls, x, cos, sin, attn_mask, cache, cache_index, mask_is_causal
            )
            new_k, new_v = ([], []) if stacked_kv is None else stacked_kv
        else:
            new_k, new_v = [], []
            for i in range(cfg.num_layers):
                layer_cache = (
                    (cache["k"][i], cache["v"][i]) if cache is not None else None
                )
                x, kv = block_cls(cfg, name=f"layers_{i}")(
                    x, cos, sin, attn_mask, layer_cache, cache_index, mask_is_causal
                )
                if kv is not None:
                    new_k.append(kv[0])
                    new_v.append(kv[1])

        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)

        new_cache = None
        if cache is not None:
            if cfg.scan_layers:
                k_stack, v_stack = new_k, new_v  # already [L, ...]
            else:
                k_stack, v_stack = jnp.stack(new_k), jnp.stack(new_v)
            new_cache = {
                "k": k_stack,
                "v": v_stack,
                "index": cache["index"] + s,
            }
        return x, new_cache

    def _scan_layers(
        self, block_cls, x, cos, sin, attn_mask, cache, cache_index, mask_is_causal
    ):
        """One compiled Block body scanned over stacked per-layer params."""
        cfg = self.config
        if cache is None:
            scanned = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 6,
                out_axes=0,
                length=cfg.num_layers,
            )
            x, _ = scanned(cfg, name="layers")(
                x, cos, sin, attn_mask, None, None, mask_is_causal
            )
            return x, None

        scanned = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, 0, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
        )
        x, kv = scanned(cfg, name="layers")(
            x, cos, sin, attn_mask, (cache["k"], cache["v"]), cache_index
        )
        return x, kv


# ---------------------------------------------------------------------------
# HF / torch weight interop
# ---------------------------------------------------------------------------


def decoder_params_from_torch(sd: dict, config: TransformerConfig, prefix: str = ""):
    """torch Qwen2Model state_dict (numpy values, keys like
    'layers.0.self_attn.q_proj.weight') -> flax params for Decoder."""
    from dmel_codec_tpu.utils.torch_compat import dense_kernel

    def lin(name, bias=True):
        p = {"kernel": dense_kernel(sd[f"{prefix}{name}.weight"])}
        if bias and f"{prefix}{name}.bias" in sd:
            p["bias"] = sd[f"{prefix}{name}.bias"]
        return p

    params: dict = {"norm": {"weight": sd[f"{prefix}norm.weight"]}}
    per_layer = []
    for i in range(config.num_layers):
        lp = f"layers.{i}."
        layer_tree = {
            "input_layernorm": {"weight": sd[f"{prefix}{lp}input_layernorm.weight"]},
            "post_attention_layernorm": {
                "weight": sd[f"{prefix}{lp}post_attention_layernorm.weight"]
            },
            "self_attn": {
                "q_proj": lin(f"{lp}self_attn.q_proj"),
                "k_proj": lin(f"{lp}self_attn.k_proj"),
                "v_proj": lin(f"{lp}self_attn.v_proj"),
                "o_proj": lin(f"{lp}self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": lin(f"{lp}mlp.gate_proj", bias=False),
                "up_proj": lin(f"{lp}mlp.up_proj", bias=False),
                "down_proj": lin(f"{lp}mlp.down_proj", bias=False),
            },
        }
        if config.scan_layers:
            per_layer.append(layer_tree)
        else:
            params[f"layers_{i}"] = layer_tree
    if config.scan_layers:
        import jax

        params["layers"] = jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves), *per_layer
        )
    return params
