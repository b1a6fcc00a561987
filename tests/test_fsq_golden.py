"""Golden FSQ token-interchange test vs a plain-numpy oracle.

`vector_quantize_pytorch` cannot be installed in this environment, so the
oracle below is a line-by-line numpy transcription of the library's exact
algorithm (the same code fish-speech and the reference pin), written
independently of the JAX implementation:

  * finite_scalar_quantization.py: `bound` (1e-3 widened half_l, even-level
    half shift via atanh), `quantize` = round(bound(z)) / (levels//2),
    `codes_to_indices` = sum((codes*half_width + half_width) * basis),
    `indices_to_codes` = ((idx // basis) % levels - half_width) / half_width
    with basis = cumprod([1, *levels[:-1]]).
  * residual_fsq.py `ResidualFSQ.forward`: project_in -> residual starts from
    `first(self.layers).bound(x)` (NOT raw x — layer 0 double-bounds), per
    round i: scale_i = (levels-1)^-i, q_i = FSQ(residual/scale_i)*scale_i,
    residual -= q_i, out = project_out(sum q_i); indices stacked on -1.
  * residual_fsq.py `get_output_from_indices`: sum_i indices_to_codes(ind_i)
    * scale_i, then project_out.
  * residual_fsq.py `GroupedResidualFSQ`: chunk the last dim into `groups`
    independent ResidualFSQs, cat outputs, stack indices on a leading G axis.

Reference call site: /root/reference/dmel_codec/models/modules/dowmsample_fsq.py
:39-44 (construction), :124-147 (token layout "g b l r -> b (g r) l").

Asserts BIT-IDENTICAL indices between dmel_codec_tpu.quantize and the oracle
for the flagship (7,5,5) x 10-group config and a multi-quantizer config.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.quantize import GroupedResidualFSQ, ResidualFSQ

FLAGSHIP_LEVELS = (7, 5, 5)


class FSQOracle:
    """numpy transcription of vector_quantize_pytorch FSQ (no projections,
    num_codebooks=1 — how ResidualFSQ instantiates it)."""

    def __init__(self, levels):
        self._levels = np.asarray(levels, np.int32)
        self._basis = np.concatenate(
            ([1], np.cumprod(self._levels[:-1]))
        ).astype(np.int32)

    def bound(self, z, eps=1e-3):
        half_l = (self._levels - 1).astype(np.float32) * (1 + eps) / 2
        offset = np.where(self._levels % 2 == 0, 0.5, 0.0).astype(np.float32)
        shift = np.arctanh(offset / half_l)
        return np.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        quantized = np.round(self.bound(z))
        half_width = (self._levels // 2).astype(np.float32)
        return quantized / half_width

    def codes_to_indices(self, zhat):
        half_width = (self._levels // 2).astype(np.float32)
        zhat = zhat * half_width + half_width
        return (zhat * self._basis).sum(-1).astype(np.int32)

    def indices_to_codes(self, indices):
        level_indices = (indices[..., None] // self._basis) % self._levels
        half_width = (self._levels // 2).astype(np.float32)
        return (level_indices.astype(np.float32) - half_width) / half_width


def residual_fsq_oracle_forward(x, levels, num_quantizers, w_in, b_in, w_out, b_out):
    fsq = FSQOracle(levels)
    if w_in is not None:
        x = x @ w_in + b_in
    x = x.astype(np.float32)
    quantized_out = np.zeros_like(x)
    residual = fsq.bound(x)  # residual_fsq.py: first(self.layers).bound(x)
    levels_f = np.asarray(levels, np.float32)
    all_indices = []
    for i in range(num_quantizers):
        scale = (levels_f - 1.0) ** (-float(i))
        codes = fsq.quantize(residual / scale)
        indices = fsq.codes_to_indices(codes)
        codes = codes * scale
        residual = residual - codes
        quantized_out = quantized_out + codes
        all_indices.append(indices)
    if w_out is not None:
        quantized_out = quantized_out @ w_out + b_out
    return quantized_out.astype(np.float32), np.stack(all_indices, -1)


def residual_fsq_oracle_decode(indices, levels, num_quantizers, w_out, b_out):
    fsq = FSQOracle(levels)
    levels_f = np.asarray(levels, np.float32)
    summed = None
    for i in range(num_quantizers):
        codes = fsq.indices_to_codes(indices[..., i])
        codes = codes * (levels_f - 1.0) ** (-float(i))
        summed = codes if summed is None else summed + codes
    if w_out is not None:
        summed = summed @ w_out + b_out
    return summed.astype(np.float32)


def _proj_weights(params):
    p = params["params"]
    if "project_in" not in p:
        return None, None, None, None
    return (
        np.asarray(p["project_in"]["kernel"]),
        np.asarray(p["project_in"]["bias"]),
        np.asarray(p["project_out"]["kernel"]),
        np.asarray(p["project_out"]["bias"]),
    )


def test_fsq_codes_and_indices_match_oracle(rng):
    from dmel_codec_tpu.quantize import FSQ

    fsq = FSQ(levels=FLAGSHIP_LEVELS)
    oracle = FSQOracle(FLAGSHIP_LEVELS)
    z = rng.standard_normal((256, 3)).astype(np.float32) * 2.5
    codes, indices = fsq.apply({}, jnp.asarray(z), method=FSQ.__call__)
    np.testing.assert_array_equal(
        np.asarray(indices), oracle.codes_to_indices(oracle.quantize(z))
    )
    np.testing.assert_allclose(np.asarray(codes), oracle.quantize(z), atol=1e-6)
    # full-codebook decode table identical
    all_idx = np.arange(int(np.prod(FLAGSHIP_LEVELS)))
    np.testing.assert_allclose(
        np.asarray(fsq.indices_to_codes(jnp.asarray(all_idx))),
        oracle.indices_to_codes(all_idx),
        atol=1e-7,
    )


def test_residual_fsq_flagship_indices_bit_identical(rng):
    """dim 70 -> (7,5,5), Q=1: the per-group config of the flagship codec."""
    m = ResidualFSQ(dim=70, levels=FLAGSHIP_LEVELS, num_quantizers=1)
    x = rng.standard_normal((2, 12, 70)).astype(np.float32)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    q_mine, idx_mine = m.apply(params, jnp.asarray(x))

    w_in, b_in, w_out, b_out = _proj_weights(params)
    q_gold, idx_gold = residual_fsq_oracle_forward(
        x, FLAGSHIP_LEVELS, 1, w_in, b_in, w_out, b_out
    )
    np.testing.assert_array_equal(np.asarray(idx_mine), idx_gold)
    np.testing.assert_allclose(np.asarray(q_mine), q_gold, atol=1e-5)

    out_mine = m.apply(params, idx_mine, method=ResidualFSQ.get_output_from_indices)
    out_gold = residual_fsq_oracle_decode(idx_gold, FLAGSHIP_LEVELS, 1, w_out, b_out)
    np.testing.assert_allclose(np.asarray(out_mine), out_gold, atol=1e-5)


def test_residual_fsq_multi_quantizer_indices_bit_identical(rng):
    """Q=3 exercises the (levels-1)^-i residual scaling chain."""
    levels = (8, 5, 5, 5)
    m = ResidualFSQ(dim=16, levels=levels, num_quantizers=3)
    x = rng.standard_normal((1, 20, 16)).astype(np.float32) * 1.5
    params = m.init(jax.random.key(1), jnp.asarray(x))
    q_mine, idx_mine = m.apply(params, jnp.asarray(x))

    w_in, b_in, w_out, b_out = _proj_weights(params)
    q_gold, idx_gold = residual_fsq_oracle_forward(x, levels, 3, w_in, b_in, w_out, b_out)
    np.testing.assert_array_equal(np.asarray(idx_mine), idx_gold)
    np.testing.assert_allclose(np.asarray(q_mine), q_gold, atol=1e-5)

    out_mine = m.apply(params, idx_mine, method=ResidualFSQ.get_output_from_indices)
    out_gold = residual_fsq_oracle_decode(idx_gold, levels, 3, w_out, b_out)
    np.testing.assert_allclose(np.asarray(out_mine), out_gold, atol=1e-5)


def test_grouped_residual_fsq_flagship_bit_identical(rng):
    """Full flagship grouped config: dim 700, 10 groups, (7,5,5), Q=1,
    including the reference's [B, (G R), L] public token layout."""
    groups, q = 10, 1
    m = GroupedResidualFSQ(
        dim=700, levels=FLAGSHIP_LEVELS, num_quantizers=q, groups=groups
    )
    x = rng.standard_normal((2, 6, 700)).astype(np.float32) * 2.0
    params = m.init(jax.random.key(2), jnp.asarray(x))
    q_mine, idx_mine = m.apply(params, jnp.asarray(x))
    assert idx_mine.shape == (groups, 2, 6, q)

    pk = params["params"]["rvqs"]
    w_in = np.asarray(pk["project_in"]["kernel"])   # [G, 70, 3]
    b_in = np.asarray(pk["project_in"]["bias"])     # [G, 3]
    w_out = np.asarray(pk["project_out"]["kernel"])  # [G, 3, 70]
    b_out = np.asarray(pk["project_out"]["bias"])    # [G, 70]

    chunks = np.split(x, groups, axis=-1)
    gold_q, gold_idx = [], []
    for g in range(groups):
        qg, ig = residual_fsq_oracle_forward(
            chunks[g], FLAGSHIP_LEVELS, q, w_in[g], b_in[g], w_out[g], b_out[g]
        )
        gold_q.append(qg)
        gold_idx.append(ig)
    np.testing.assert_array_equal(np.asarray(idx_mine), np.stack(gold_idx))
    np.testing.assert_allclose(
        np.asarray(q_mine), np.concatenate(gold_q, -1), atol=1e-5
    )

    # decode path (used by DMelCodec.decode) bit-compatible too
    out_mine = m.apply(params, idx_mine, method=GroupedResidualFSQ.decode)
    gold_dec = [
        residual_fsq_oracle_decode(
            np.asarray(idx_mine)[g], FLAGSHIP_LEVELS, q, w_out[g], b_out[g]
        )
        for g in range(groups)
    ]
    np.testing.assert_allclose(
        np.asarray(out_mine), np.concatenate(gold_dec, -1), atol=1e-5
    )

    # reference public layout "g b l r -> b (g r) l" (dowmsample_fsq.py:132)
    g_, b_, l_, r_ = idx_mine.shape
    ref_layout = np.asarray(idx_mine).transpose(1, 0, 3, 2).reshape(b_, g_ * r_, l_)
    for gi in range(g_):
        np.testing.assert_array_equal(ref_layout[:, gi, :], np.asarray(idx_mine)[gi, :, :, 0])
