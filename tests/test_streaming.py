"""Chunked (streaming) codec inference must EQUAL the one-shot API.

Bounded-memory serving for long audio (models/streaming.py): interior
chunks see real halos >= the receptive field; edge chunks clamp the
window to the true signal boundary so per-layer 'SAME' padding lands
identically. The bar is exactness, not approximation.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig
from dmel_codec_tpu.models.streaming import chunked_decode, chunked_encode

CFG = DMelCodecConfig(
    encoder_residual_channels=12, encoder_layers=4, decoder_layers=4
)
# receptive field for 4 layers (dilations 1,2,4,8) ~ 15 frames + ConvNeXt 18
HALO_FRAMES = 64


def _init(rng_np, t, b=2):
    model = DMelCodec(config=CFG)
    mels = np.asarray(rng_np.standard_normal((b, t, CFG.n_mels)), np.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(mels),
        jnp.ones((b, t, 1)),
        jnp.zeros((b, 1)),
        jnp.zeros((b, t, CFG.concat_dim)),
    )["params"]
    return model, params, mels


def test_chunked_encode_exact(rng):
    t = 1000  # not a chunk multiple: exercises the tail path
    model, params, mels = _init(rng, t)
    lengths = jnp.full((2,), t, jnp.int32)
    want, _ = jax.jit(
        lambda p, x, n: model.apply({"params": p}, x, n, method=DMelCodec.encode)
    )(params, jnp.asarray(mels), lengths)

    got = chunked_encode(
        model, params, mels, chunk_frames=256, halo_frames=HALO_FRAMES
    )
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, np.asarray(want))


def test_chunked_encode_short_input_one_shot(rng):
    model, params, mels = _init(rng, 128)
    lengths = jnp.full((2,), 128, jnp.int32)
    want, _ = jax.jit(
        lambda p, x, n: model.apply({"params": p}, x, n, method=DMelCodec.encode)
    )(params, jnp.asarray(mels), lengths)
    got = chunked_encode(model, params, mels, chunk_frames=256, halo_frames=HALO_FRAMES)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_chunked_decode_exact(rng):
    t = 1024
    model, params, mels = _init(rng, t)
    lengths = jnp.full((2,), t, jnp.int32)
    indices, idx_len = jax.jit(
        lambda p, x, n: model.apply({"params": p}, x, n, method=DMelCodec.encode)
    )(params, jnp.asarray(mels), lengths)
    l = indices.shape[2]
    noise = np.asarray(
        np.random.default_rng(1).standard_normal((2, l * CFG.downsample_total, CFG.concat_dim)),
        np.float32,
    )

    want = jax.jit(
        lambda p, i, fl, n: model.apply(
            {"params": p}, i, fl, n, method=DMelCodec.decode
        )
    )(params, indices, idx_len, jnp.asarray(noise))

    got = chunked_decode(
        model,
        params,
        np.asarray(indices),
        noise=noise,
        chunk_tokens=64,
        halo_tokens=HALO_FRAMES // 4,
    )
    assert got.shape == np.asarray(want).shape
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)


def test_chunked_vocode_exact(rng):
    """chunked_vocode == one-shot BigVGAN at flagship geometry (narrow
    channels — the receptive field depends on kernels/rates only)."""
    from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from dmel_codec_tpu.models.streaming import chunked_vocode

    cfg = BigVGANConfig(num_mels=8, upsample_initial_channel=64)
    voc = BigVGAN(cfg)
    t = 300  # not a chunk multiple: exercises the tail path
    mel = np.asarray(rng.standard_normal((2, t, 8)), np.float32)
    params = voc.init(jax.random.PRNGKey(0), jnp.asarray(mel))["params"]

    want = np.asarray(jax.jit(lambda p, x: voc.apply({"params": p}, x))(
        params, jnp.asarray(mel)
    ))
    got = chunked_vocode(voc, params, mel, chunk_frames=96, halo_frames=40)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_chunked_vocode_short_input_one_shot(rng):
    from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from dmel_codec_tpu.models.streaming import chunked_vocode

    cfg = BigVGANConfig(num_mels=8, upsample_initial_channel=64)
    voc = BigVGAN(cfg)
    mel = np.asarray(rng.standard_normal((1, 64, 8)), np.float32)
    params = voc.init(jax.random.PRNGKey(0), jnp.asarray(mel))["params"]
    want = np.asarray(jax.jit(lambda p, x: voc.apply({"params": p}, x))(
        params, jnp.asarray(mel)
    ))
    got = chunked_vocode(voc, params, mel, chunk_frames=96, halo_frames=40)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
