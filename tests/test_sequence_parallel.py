"""Time-axis (sequence) parallel codec inference on the 8-device mesh.

Beyond-parity: the reference handles long audio by window-cropping in the
data pipeline (SURVEY §5); here the fully-convolutional codec shards the
TIME axis across the mesh and XLA inserts the conv halo exchanges. The
proof is exactness: sharded encode/decode must match the single-device
results, with the token/mel layouts actually distributed.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
from dmel_codec_tpu.parallel.mesh import DATA_AXIS, data_mesh
from dmel_codec_tpu.parallel.sequence import time_sharded_decode, time_sharded_encode

CFG = DMelCodecConfig(
    encoder_residual_channels=12, encoder_layers=3, decoder_layers=3
)


def _init(rng_np, t=64, b=2):
    model = DMelCodec(config=CFG)
    mels = jnp.asarray(rng_np.standard_normal((b, t, CFG.n_mels)), jnp.float32)
    masks = jnp.ones((b, t, 1))
    params = model.init(
        jax.random.PRNGKey(0),
        mels,
        masks,
        jnp.zeros((b, 1)),
        jnp.zeros((b, t, CFG.concat_dim)),
    )["params"]
    return model, params, mels


def test_time_sharded_encode_matches_single_device(rng):
    model, params, mels = _init(rng)
    lengths = jnp.array([64, 48])
    mesh = data_mesh()

    want, want_len = jax.jit(
        lambda p, m, l: model.apply({"params": p}, m, l, method=DMelCodec.encode)
    )(params, mels, lengths)

    enc = time_sharded_encode(model, mesh)
    got, got_len = enc(params, mels, lengths)

    # really distributed: tokens sharded along L
    assert got.sharding.spec == P(None, None, DATA_AXIS)
    assert len({s.device for s in got.addressable_shards}) == 8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_len), np.asarray(want_len))


def test_time_sharded_decode_matches_single_device(rng):
    model, params, mels = _init(rng)
    lengths = jnp.array([64, 48])
    mesh = data_mesh()

    indices, idx_len = jax.jit(
        lambda p, m, l: model.apply({"params": p}, m, l, method=DMelCodec.encode)
    )(params, mels, lengths)
    t = indices.shape[2] * CFG.downsample_total
    noise = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, t, CFG.concat_dim)),
        jnp.float32,
    )

    want = jax.jit(
        lambda p, i, l, n: model.apply(
            {"params": p}, i, l, n, method=DMelCodec.decode
        )
    )(params, indices, idx_len, noise)

    dec = time_sharded_decode(model, mesh)
    got = dec(params, indices, idx_len, noise)

    assert got.sharding.spec == P(None, DATA_AXIS, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
