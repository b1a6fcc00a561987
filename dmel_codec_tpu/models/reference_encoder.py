"""Reference/speaker encoder — WaveNet + latent-query attention pooling.

Capability parity with reference models/modules/reference.py:10-95 (kept
for inventory completeness; no config in the reference wires it either):
WaveNet trunk -> `latent_len` learned queries cross-attend over the time
axis (per-head LayerNorm on q/k), residual MLP, output projection, mean
over the latent axis -> one fixed-size embedding per utterance.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.nn.wavenet import WaveNet

_INIT = nn.initializers.truncated_normal(stddev=0.02)


class ReferenceEncoder(nn.Module):
    input_channels: Optional[int] = None
    output_channels: int = 512
    residual_channels: int = 512
    residual_layers: int = 20
    dilation_cycle: int = 4
    num_heads: int = 8
    latent_len: int = 4

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x [B, T, C_in], attn_mask [B, T] bool -> embedding [B, out]."""
        c = self.residual_channels
        hd = c // self.num_heads
        x = WaveNet(
            input_channels=self.input_channels,
            residual_channels=c,
            residual_layers=self.residual_layers,
            dilation_cycle=self.dilation_cycle,
            name="wavenet",
        )(x)
        b, n, _ = x.shape

        latent = self.param("latent", _INIT, (1, self.latent_len, c))
        q = nn.Dense(c, kernel_init=_INIT, name="q")(
            jnp.broadcast_to(latent, (b, self.latent_len, c))
        ).reshape(b, self.latent_len, self.num_heads, hd)
        kv = nn.Dense(2 * c, kernel_init=_INIT, name="kv")(x).reshape(
            b, n, 2, self.num_heads, hd
        )
        k, v = kv[:, :, 0], kv[:, :, 1]

        q = nn.LayerNorm(name="q_norm")(q)
        k = nn.LayerNorm(name="k_norm")(k)

        scores = jnp.einsum("blhd,bnhd->bhln", q, k) / np.sqrt(hd)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, None, :], scores, -1e30)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhln,bnhd->blhd", probs, v).reshape(b, self.latent_len, c)

        out = nn.Dense(c, kernel_init=_INIT, name="proj")(out)
        out = nn.Dropout(0.1, deterministic=deterministic)(out)

        h = nn.LayerNorm(name="norm")(out)
        h = nn.Dense(4 * c, kernel_init=_INIT, name="mlp_0")(h)
        h = nn.silu(h)
        h = nn.Dense(c, kernel_init=_INIT, name="mlp_1")(h)
        out = out + h
        out = nn.Dense(
            self.output_channels, kernel_init=_INIT, name="output_projection_attn"
        )(out)
        return out.mean(axis=1)
