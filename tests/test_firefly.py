"""FireflyGAN golden parity vs reference firefly modules (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import tests.reference_import  # noqa: F401
from dmel_codec.models.modules.firefly import (
    ConvNeXtEncoder as RefConvNeXtEncoder,
    HiFiGANGenerator as RefHiFiGANGenerator,
)

from dmel_codec_tpu.models.firefly import (
    ConvNeXtEncoder,
    ConvNeXtEncoderConfig,
    FireflyGAN,
    HiFiGANConfig,
    HiFiGANGenerator,
    convnext_encoder_params_from_torch,
    firefly_params_from_torch,
    hifigan_params_from_torch,
)


def test_hifigan_generator_matches_reference(rng):
    torch.manual_seed(0)
    kwargs = dict(
        hop_length=4,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
        num_mels=8,
        upsample_initial_channel=16,
        use_template=True,
    )
    ref = RefHiFiGANGenerator(
        **{k: list(v) if isinstance(v, tuple) else v for k, v in kwargs.items()}
    ).eval()
    cfg = HiFiGANConfig(**kwargs)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hifigan_params_from_torch(sd, cfg)

    mel = rng.standard_normal((2, 12, 8)).astype(np.float32)
    template = rng.standard_normal((2, 12 * 4, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(mel.transpose(0, 2, 1)),
            template=torch.from_numpy(template.transpose(0, 2, 1)),
        ).numpy()[:, 0, :]
    got = HiFiGANGenerator(cfg).apply(
        {"params": params}, jnp.asarray(mel), jnp.asarray(template)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_convnext_encoder_matches_reference(rng):
    torch.manual_seed(1)
    ref = RefConvNeXtEncoder(
        input_channels=6, depths=[1, 2], dims=[8, 16], kernel_size=7
    ).eval()
    cfg = ConvNeXtEncoderConfig(
        input_channels=6, depths=(1, 2), dims=(8, 16), kernel_size=7
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convnext_encoder_params_from_torch(sd, cfg)

    x = rng.standard_normal((2, 20, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    got = ConvNeXtEncoder(cfg).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=3e-5, rtol=1e-4
    )


def test_firefly_full_model_builds_and_converts(rng):
    """Tiny end-to-end FireflyGAN with the fish-speech key layout."""
    enc = ConvNeXtEncoderConfig(input_channels=8, depths=(1, 1), dims=(8, 12))
    head = HiFiGANConfig(
        hop_length=4,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
        num_mels=12,
        upsample_initial_channel=16,
        use_template=False,
    )
    model = FireflyGAN(encoder=enc, head=head)
    mel = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mel)["params"]
    wav = model.apply({"params": params}, mel)
    assert wav.shape == (1, 8 * 4)

    # converter round-trip over a synthesized torch-layout dict
    torch.manual_seed(2)
    ref_backbone = RefConvNeXtEncoder(
        input_channels=8, depths=[1, 1], dims=[8, 12], kernel_size=7
    )
    ref_head = RefHiFiGANGenerator(
        hop_length=4,
        upsample_rates=[2, 2],
        upsample_kernel_sizes=[4, 4],
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]],
        num_mels=12,
        upsample_initial_channel=16,
        use_template=False,
    )
    ref_backbone = ref_backbone.eval()
    ref_head = ref_head.eval()  # ref fwd touches undefined self.checkpointing when training
    sd = {f"backbone.{k}": v.detach().numpy() for k, v in ref_backbone.state_dict().items()}
    sd |= {f"head.{k}": v.detach().numpy() for k, v in ref_head.state_dict().items()}
    params2 = firefly_params_from_torch(sd, model)
    with torch.no_grad():
        mel_t = torch.from_numpy(np.asarray(mel).transpose(0, 2, 1))
        want = ref_head(ref_backbone(mel_t)).numpy()[:, 0, :]
    got = model.apply({"params": params2}, mel)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)
