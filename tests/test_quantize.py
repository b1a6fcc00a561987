"""FSQ + downsample-FSQ correctness.

vector_quantize_pytorch is not installed here, so FSQ is validated against
its mathematical invariants (every config the reference uses is covered):
bijection over all prod(levels) codes, bounded rounding, STE gradients,
encode/decode consistency, and reference token layout [B, (G R), L].
The torch-semantics transposed conv is golden-tested against torch directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dmel_codec_tpu.nn.conv import ConvTranspose1dTorch
from dmel_codec_tpu.quantize import (
    FSQ,
    DownsampleFiniteScalarQuantize,
    GroupedResidualFSQ,
    ResidualFSQ,
)

LEVELS = (7, 5, 5)  # flagship config: 175 codes/codebook


def test_fsq_bijection_all_codes():
    fsq = FSQ(levels=LEVELS)
    n = int(np.prod(LEVELS))
    indices = jnp.arange(n)
    codes = fsq.indices_to_codes(indices)
    assert codes.shape == (n, len(LEVELS))
    back = fsq.codes_to_indices(codes)
    np.testing.assert_array_equal(np.asarray(back), np.arange(n))
    # codes are the full lattice in [-1, 1]
    uniq = np.unique(np.asarray(codes), axis=0)
    assert uniq.shape[0] == n


def test_fsq_quantize_is_on_lattice(rng):
    fsq = FSQ(levels=LEVELS)
    z = jnp.asarray(rng.standard_normal((64, 3)) * 3)
    codes, indices = fsq.apply({}, z, method=FSQ.__call__)
    # every quantized value must decode back to itself through the index
    recon = fsq.indices_to_codes(indices)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(codes), atol=1e-6)
    assert int(indices.max()) < int(np.prod(LEVELS))
    assert int(indices.min()) >= 0


def test_fsq_ste_gradient():
    fsq = FSQ(levels=LEVELS)

    def loss(z):
        return (fsq.quantize(z) ** 2).sum()

    g = jax.grad(loss)(jnp.ones((4, 3)) * 0.5)  # bound(0.5) rounds to code 1
    # STE passes gradients through the rounding: grad must be nonzero finite
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_residual_fsq_projection_roundtrip(rng):
    m = ResidualFSQ(dim=70, levels=LEVELS, num_quantizers=1)
    x = jnp.asarray(rng.standard_normal((2, 12, 70)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    quantized, indices = m.apply(params, x)
    assert quantized.shape == x.shape
    assert indices.shape == (2, 12, 1)
    out = m.apply(params, indices, method=ResidualFSQ.get_output_from_indices)
    np.testing.assert_allclose(np.asarray(out), np.asarray(quantized), atol=1e-5)


def test_residual_fsq_multi_quantizer(rng):
    """n_codebooks > 1 exercises the residual scales path (capability parity)."""
    m = ResidualFSQ(dim=16, levels=(8, 5, 5, 5), num_quantizers=3)
    x = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    quantized, indices = m.apply(params, x)
    assert indices.shape == (1, 8, 3)
    out = m.apply(params, indices, method=ResidualFSQ.get_output_from_indices)
    np.testing.assert_allclose(np.asarray(out), np.asarray(quantized), atol=1e-5)


def test_grouped_residual_fsq(rng):
    m = GroupedResidualFSQ(dim=700, levels=LEVELS, num_quantizers=1, groups=10)
    x = jnp.asarray(rng.standard_normal((2, 6, 700)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    quantized, indices = m.apply(params, x)
    assert quantized.shape == x.shape
    assert indices.shape == (10, 2, 6, 1)
    out = m.apply(params, indices, method=GroupedResidualFSQ.decode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(quantized), atol=1e-5)
    # groups have independent parameters
    pk = params["params"]["rvqs"]["project_in"]["kernel"]
    assert pk.shape == (10, 70, 3)


def test_conv_transpose_matches_torch(rng):
    """General k, stride, padding vs torch.nn.ConvTranspose1d."""
    from dmel_codec_tpu.utils import torch_compat as tc

    for (cin, cout, k, s, p) in [(6, 4, 2, 2, 0), (8, 4, 8, 4, 2), (5, 3, 4, 2, 1)]:
        torch.manual_seed(k * 10 + s)
        ref = torch.nn.ConvTranspose1d(cin, cout, k, s, padding=p)
        x = rng.standard_normal((2, cin, 16)).astype(np.float32)
        with torch.no_grad():
            golden = ref(torch.from_numpy(x)).numpy()
        m = ConvTranspose1dTorch(cout, kernel_size=k, stride=s, padding=p)
        params = {
            "params": {
                "kernel": tc.conv_transpose1d_kernel(ref.weight.detach().numpy()),
                "bias": ref.bias.detach().numpy(),
            }
        }
        ours = np.asarray(m.apply(params, x.transpose(0, 2, 1)))
        assert ours.shape[1] == golden.shape[2]
        np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5)


def test_downsample_fsq_token_layout_and_roundtrip(rng):
    """Flagship dMel quantizer: 700 dim, 10 groups, (7,5,5), downsample (2,2)."""
    q = DownsampleFiniteScalarQuantize(
        input_dim=700,
        n_codebooks=1,
        n_groups=10,
        levels=LEVELS,
        downsample_factor=(2, 2),
        is_dmel=True,
    )
    t = 20
    x = jnp.asarray(rng.standard_normal((2 * 10, t, 70)).astype(np.float32))
    params = q.init(jax.random.key(0), x)

    result = q.apply(params, x)
    assert result.z.shape == (2, t, 700)  # regrouped output
    assert result.codes.shape == (10, 2, t // 4, 1)

    indices = q.apply(params, x, method=DownsampleFiniteScalarQuantize.encode)
    assert indices.shape == (2, 10, t // 4)
    assert int(indices.max()) < 175

    feats = q.apply(params, indices, method=DownsampleFiniteScalarQuantize.decode)
    assert feats.shape == (2, (t // 4) * 4, 700)

    # encode -> decode must agree with the forward's post-FSQ reconstruction
    # on the un-padded region
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(result.z[:, : feats.shape[1], :]), atol=1e-5
    )


def test_downsample_fsq_odd_length_padding(rng):
    q = DownsampleFiniteScalarQuantize(
        input_dim=60, n_codebooks=1, n_groups=6, levels=LEVELS,
        downsample_factor=(2, 2), is_dmel=True,
    )
    x = jnp.asarray(rng.standard_normal((6, 19, 10)).astype(np.float32))
    params = q.init(jax.random.key(0), x)
    result = q.apply(params, x)
    assert result.z.shape == (1, 19, 60)  # padded back to input length
