"""Boundary semantics: the kernel is reference-exact at the edges.

The reference replicate-pads the *upsampled* signal before the downsample
FIR (bigvgan/alias_free_activation/torch/resample.py DownSample1d); the
kernel reproduces that via in-VMEM row writes on the first/last tile, so
no post-hoc patch exists and `exact_edges` is a no-op — the first/last 3
frames must match the oracle exactly on every dispatch path.
"""

import numpy as np
import jax.numpy as jnp

from dmel_codec_tpu.ops.anti_alias import (
    anti_alias_activation_reference,
    fused_anti_alias_activation,
)


def test_edges_exact_on_all_paths(rng):
    x = jnp.asarray(rng.standard_normal((1, 128, 16)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.3)
    want = anti_alias_activation_reference(x, alpha, beta, True)
    for exact_edges in (True, False):  # flag is accepted but changes nothing
        got = fused_anti_alias_activation(x, alpha, beta, True, True, exact_edges)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_edges_exact_multi_tile_merged(rng):
    """A long-T merged-lane input exercises the head/interior/last DMA
    branches and both in-kernel edge fixups."""
    x = jnp.asarray(rng.standard_normal((3, 400, 24)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.3)
    want = anti_alias_activation_reference(x, alpha, beta, True)
    got = fused_anti_alias_activation(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
