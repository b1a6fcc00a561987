"""Snake periodic activations (reference: bigvgan/activations.py:9-126).

snake(x)      = x + (1/(alpha+eps)) * sin^2(alpha x)
snake_beta(x) = x + (1/(beta +eps)) * sin^2(alpha x)

With `alpha_logscale` the stored parameters are log-alpha/log-beta and are
exponentiated on the fly (the BigVGAN-v2 checkpoints use this).
Channels-last: alpha/beta broadcast over [..., C].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_EPS = 1e-9


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool = False) -> jnp.ndarray:
    if logscale:
        alpha = jnp.exp(alpha)
    s = jnp.sin(x * alpha)
    return x + (1.0 / (alpha + _EPS)) * s * s


def snake_beta(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool = False
) -> jnp.ndarray:
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + _EPS)) * s * s


class Snake(nn.Module):
    features: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.features,))
        return snake(x, alpha, self.alpha_logscale)


class SnakeBeta(nn.Module):
    features: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.features,))
        beta = self.param("beta", init, (self.features,))
        return snake_beta(x, alpha, beta, self.alpha_logscale)
