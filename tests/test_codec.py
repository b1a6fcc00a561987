"""DMelCodec model: golden discriminator parity + codec API invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import tests.reference_import  # noqa: F401
from dmel_codec.models.modules.discriminator import Discriminator as RefDiscriminator

from dmel_codec_tpu.models.codec import (
    DMelCodec,
    DMelCodecConfig,
    quality_from_gt_mels,
)
from dmel_codec_tpu.models.discriminator import MelDiscriminator
from dmel_codec_tpu.utils import torch_compat as tc

CFG = DMelCodecConfig()


def test_discriminator_matches_reference(rng):
    torch.manual_seed(0)
    ref = RefDiscriminator().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = {}
    conv_idx = 0
    for i in range(0, 11, 2):  # blocks 0,2,4,6,8,10 are convs (odd are SiLU)
        g = sd[f"blocks.{i}.parametrizations.weight.original0"]
        v = sd[f"blocks.{i}.parametrizations.weight.original1"]
        params[f"conv_{conv_idx}"] = {
            "v": tc.conv2d_kernel(v),
            "g": g.reshape(-1),
            "bias": sd[f"blocks.{i}.bias"],
        }
        conv_idx += 1

    mel_bt = rng.standard_normal((2, 128, 100)).astype(np.float32)  # [B, T, M]
    with torch.no_grad():
        want = ref(torch.from_numpy(mel_bt.transpose(0, 2, 1))).numpy()  # [B, M', T']

    got = MelDiscriminator().apply({"params": params}, jnp.asarray(mel_bt))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_quality_scalar_matches_reference_formula(rng):
    mels_bmt = rng.standard_normal((3, 100, 50)).astype(np.float32) * 4 - 8
    ref_t = torch.from_numpy(mels_bmt)
    want = (((ref_t.mean(-1) > -8).sum(-1) - 90) / 10).unsqueeze(-1).numpy()
    got = quality_from_gt_mels(jnp.asarray(mels_bmt.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got), want)


def _init_codec():
    model = DMelCodec(config=CFG)
    b, t = 2, 32
    mels = jnp.zeros((b, t, CFG.n_mels))
    masks = jnp.ones((b, t, 1))
    quality = jnp.zeros((b, 1))
    noise = jnp.zeros((b, t, CFG.concat_dim))
    params = model.init(jax.random.PRNGKey(0), mels, masks, quality, noise)["params"]
    return model, params


def test_codec_training_forward_shapes(rng):
    model, params = _init_codec()
    b, t = 2, 32
    mels = jnp.asarray(rng.standard_normal((b, t, CFG.n_mels)).astype(np.float32))
    masks = jnp.ones((b, t, 1))
    quality = quality_from_gt_mels(mels)
    noise = jnp.asarray(
        rng.standard_normal((b, t, CFG.concat_dim)).astype(np.float32)
    )
    gen_mel, vq = model.apply({"params": params}, mels, masks, quality, noise)
    assert gen_mel.shape == (b, t, CFG.n_mels)
    # codes layout [G, B, L, R]
    assert vq.codes.shape == (
        CFG.dmel_groups,
        b,
        t // CFG.downsample_total,
        CFG.n_codebooks,
    )


def test_codec_encode_decode_roundtrip(rng):
    """encode -> decode must agree with the training-path quantized tokens."""
    model, params = _init_codec()
    b, t = 2, 32
    mels = jnp.asarray(rng.standard_normal((b, t, CFG.n_mels)).astype(np.float32))
    lengths = jnp.array([t, t // 2])

    indices, idx_lengths = model.apply(
        {"params": params}, mels, lengths, method=DMelCodec.encode
    )
    assert indices.shape == (b, CFG.num_codebook_rows, t // CFG.downsample_total)
    assert indices.dtype == jnp.int32
    np.testing.assert_array_equal(
        np.asarray(idx_lengths), [t // 4, t // 2 // 4]
    )
    assert int(indices.max()) < CFG.codebook_size and int(indices.min()) >= 0

    noise = jnp.asarray(
        rng.standard_normal((b, t, CFG.concat_dim)).astype(np.float32)
    )
    gen_mel = model.apply(
        {"params": params}, indices, idx_lengths, noise, method=DMelCodec.decode
    )
    assert gen_mel.shape == (b, t, CFG.n_mels)
    # masked tail of the short item decodes to exact zeros
    np.testing.assert_array_equal(np.asarray(gen_mel[1, t // 2 :, :]), 0.0)

    # decode is deterministic given the noise
    gen_mel2 = model.apply(
        {"params": params}, indices, idx_lengths, noise, method=DMelCodec.decode
    )
    np.testing.assert_array_equal(np.asarray(gen_mel), np.asarray(gen_mel2))


def test_codec_encode_is_jittable():
    model, params = _init_codec()

    @jax.jit
    def run(mels, lengths):
        return model.apply({"params": params}, mels, lengths, method=DMelCodec.encode)

    indices, _ = run(jnp.zeros((1, 64, CFG.n_mels)), jnp.array([64]))
    assert indices.shape == (1, CFG.num_codebook_rows, 16)


def test_weight_norm_identity_at_init():
    """g == ||v|| at init, so the effective kernel equals v (torch parity)."""
    import jax

    from dmel_codec_tpu.nn.weight_norm import WNConv, WNConvTranspose1d

    conv = WNConv(8, kernel_size=(3, 9), padding=(1, 4))
    p = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 12, 1)))["params"]
    want = np.sqrt((np.asarray(p["v"]) ** 2).sum(axis=(0, 1, 2)))
    np.testing.assert_allclose(np.asarray(p["g"]), want, rtol=1e-6)

    convt = WNConvTranspose1d(8, kernel_size=4, stride=2)
    p = convt.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 6)))["params"]
    want = np.sqrt((np.asarray(p["v"]) ** 2).sum(axis=(0, 2)))
    np.testing.assert_allclose(np.asarray(p["g"]), want, rtol=1e-6)
