"""exact_edges=False: interior identical to the oracle, edges approximate."""

import numpy as np
import jax.numpy as jnp

from dmel_codec_tpu.ops.anti_alias import (
    anti_alias_activation_reference,
    fused_anti_alias_activation,
)


def test_inexact_edges_interior_still_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 128, 16)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.3)
    want = anti_alias_activation_reference(x, alpha, beta, True)
    got = fused_anti_alias_activation(x, alpha, beta, True, True, False)
    np.testing.assert_allclose(
        np.asarray(got[:, 3:-3]), np.asarray(want[:, 3:-3]), atol=1e-5
    )
    # boundary rows deviate only at numerical-noise-to-small scale
    edge_err = float(jnp.abs(got[:, :3] - want[:, :3]).max())
    assert edge_err < 0.5
