"""Golden parity: JAX nn modules vs the reference torch modules.

Same weights loaded into both implementations; outputs must match to
float32 tolerance. Covers WaveNet (with/without condition), ConvNeXtBlock,
snake/snakebeta, and the kaiser-sinc up/down samplers.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import tests.reference_import  # noqa: F401  (sys.path for the reference)
from dmel_codec.models.modules import wavenet as ref_wavenet
from dmel_codec.models.modules import firefly as ref_firefly
from dmel_codec.models.modules.bigvgan import activations as ref_act
from dmel_codec.models.modules.bigvgan.alias_free_activation.torch import (
    resample as ref_resample,
)
from dmel_codec.models.modules.bigvgan.alias_free_activation.torch import (
    filter as ref_filter,
)

from dmel_codec_tpu.nn import (
    ConvNeXtBlock,
    DownSample1d,
    Snake,
    SnakeBeta,
    UpSample1d,
    WaveNet,
    kaiser_sinc_filter1d,
)
from dmel_codec_tpu.utils import torch_compat as tc

ATOL = 2e-5


def t2n(t):
    return t.detach().numpy()


def wavenet_params_from_torch(ref, n_layers, has_input_proj, has_output_proj, has_cond):
    sd = {k: t2n(v) for k, v in ref.state_dict().items()}
    p = {}
    if has_input_proj:
        p["input_projection"] = {
            "kernel": tc.conv1d_1x1_to_dense(sd["input_projection.conv.weight"]),
            "bias": sd["input_projection.conv.bias"],
        }
    for i in range(n_layers):
        layer = {
            "conv": {
                "kernel": tc.conv1d_kernel(sd[f"residual_layers.{i}.conv_layer.conv.weight"]),
                "bias": sd[f"residual_layers.{i}.conv_layer.conv.bias"],
            },
            "output_projection": {
                "kernel": tc.conv1d_1x1_to_dense(
                    sd[f"residual_layers.{i}.output_projection.conv.weight"]
                ),
                "bias": sd[f"residual_layers.{i}.output_projection.conv.bias"],
            },
        }
        if has_cond:
            layer["condition_projection"] = {
                "kernel": tc.conv1d_1x1_to_dense(
                    sd[f"residual_layers.{i}.condition_projection.conv.weight"]
                ),
                "bias": sd[f"residual_layers.{i}.condition_projection.conv.bias"],
            }
        p[f"layer_{i}"] = layer
    p["skip_projection"] = {
        "kernel": tc.conv1d_1x1_to_dense(sd["skip_projection.conv.weight"]),
        "bias": sd["skip_projection.conv.bias"],
    }
    if has_output_proj:
        p["output_projection"] = {
            "kernel": tc.conv1d_1x1_to_dense(sd["output_projection.conv.weight"]),
            "bias": sd["output_projection.conv.bias"],
        }
    return {"params": p}


def test_wavenet_encoder_parity(rng):
    """dMel per-band encoder config: 10 -> 70 ch, 20 layers (stage config)."""
    torch.manual_seed(0)
    ref = ref_wavenet.WaveNet(
        input_channels=10, residual_channels=70, residual_layers=20, dilation_cycle=4
    ).eval()
    x = rng.standard_normal((3, 10, 64)).astype(np.float32)
    with torch.no_grad():
        golden = t2n(ref(torch.from_numpy(x)))

    model = WaveNet(input_channels=10, residual_channels=70, residual_layers=20)
    params = wavenet_params_from_torch(ref, 20, True, False, False)
    ours = np.asarray(model.apply(params, x.transpose(0, 2, 1)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=ATOL)


def test_wavenet_decoder_parity(rng):
    """Conditional mel decoder config: 64ch residual, condition, 100 out."""
    torch.manual_seed(1)
    ref = ref_wavenet.WaveNet(
        input_channels=64,
        output_channels=40,
        residual_channels=64,
        residual_layers=6,
        dilation_cycle=4,
        condition_channels=64,
    ).eval()
    x = rng.standard_normal((2, 64, 48)).astype(np.float32)
    cond = rng.standard_normal((2, 64, 48)).astype(np.float32)
    with torch.no_grad():
        golden = t2n(ref(torch.from_numpy(x), condition=torch.from_numpy(cond)))

    model = WaveNet(
        input_channels=64,
        output_channels=40,
        residual_channels=64,
        residual_layers=6,
        condition_channels=64,
    )
    params = wavenet_params_from_torch(ref, 6, False, True, True)
    ours = np.asarray(
        model.apply(params, x.transpose(0, 2, 1), cond.transpose(0, 2, 1))
    )
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=ATOL)


def test_convnext_block_parity(rng):
    torch.manual_seed(2)
    ref = ref_firefly.ConvNeXtBlock(dim=70).eval()
    x = rng.standard_normal((2, 70, 32)).astype(np.float32)
    with torch.no_grad():
        golden = t2n(ref(torch.from_numpy(x)))

    sd = {k: t2n(v) for k, v in ref.state_dict().items()}
    params = {
        "params": {
            "dwconv": {"kernel": tc.conv1d_kernel(sd["dwconv.weight"]), "bias": sd["dwconv.bias"]},
            "norm": {"weight": sd["norm.weight"], "bias": sd["norm.bias"]},
            "pwconv1": {"kernel": tc.dense_kernel(sd["pwconv1.weight"]), "bias": sd["pwconv1.bias"]},
            "pwconv2": {"kernel": tc.dense_kernel(sd["pwconv2.weight"]), "bias": sd["pwconv2.bias"]},
            "gamma": sd["gamma"],
        }
    }
    ours = np.asarray(ConvNeXtBlock(dim=70).apply(params, x.transpose(0, 2, 1)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=ATOL)


@pytest.mark.parametrize("logscale", [False, True])
def test_snake_beta_parity(rng, logscale):
    torch.manual_seed(3)
    ref = ref_act.SnakeBeta(16, alpha_logscale=logscale)
    with torch.no_grad():
        ref.alpha.copy_(torch.randn(16) * 0.3)
        ref.beta.copy_(torch.randn(16) * 0.3)
    x = rng.standard_normal((2, 16, 40)).astype(np.float32)
    with torch.no_grad():
        golden = t2n(ref(torch.from_numpy(x)))
    params = {"params": {"alpha": t2n(ref.alpha), "beta": t2n(ref.beta)}}
    ours = np.asarray(
        SnakeBeta(16, alpha_logscale=logscale).apply(params, x.transpose(0, 2, 1))
    )
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=ATOL)


@pytest.mark.parametrize("logscale", [False, True])
def test_snake_parity(rng, logscale):
    ref = ref_act.Snake(8, alpha_logscale=logscale)
    with torch.no_grad():
        ref.alpha.copy_(torch.randn(8) * 0.3)
    x = rng.standard_normal((1, 8, 33)).astype(np.float32)
    with torch.no_grad():
        golden = t2n(ref(torch.from_numpy(x)))
    params = {"params": {"alpha": t2n(ref.alpha)}}
    ours = np.asarray(
        Snake(8, alpha_logscale=logscale).apply(params, x.transpose(0, 2, 1))
    )
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=ATOL)


def test_kaiser_filter_parity():
    for ratio in (2,):
        ref_f = ref_filter.kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, 12).numpy()
        ours = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, 12)
        np.testing.assert_allclose(ours, ref_f[0, 0], atol=1e-7)


def test_upsample_downsample_parity(rng):
    x = rng.standard_normal((2, 6, 50)).astype(np.float32)
    ref_up = ref_resample.UpSample1d(2)
    ref_down = ref_resample.DownSample1d(2)
    with torch.no_grad():
        golden_up = t2n(ref_up(torch.from_numpy(x)))
        golden_down = t2n(ref_down(torch.from_numpy(x)))

    up = UpSample1d(2)
    down = DownSample1d(2)
    ours_up = np.asarray(up(x.transpose(0, 2, 1)))
    ours_down = np.asarray(down(x.transpose(0, 2, 1)))
    assert ours_up.shape == (2, 100, 6)
    np.testing.assert_allclose(ours_up.transpose(0, 2, 1), golden_up, atol=ATOL)
    np.testing.assert_allclose(ours_down.transpose(0, 2, 1), golden_down, atol=ATOL)


def test_activation1d_composition_parity(rng):
    """Full anti-aliased snakebeta: up -> act -> down, vs reference Activation1d."""
    from dmel_codec.models.modules.bigvgan.alias_free_activation.torch import act as ref_act1d

    torch.manual_seed(4)
    ref_sb = ref_act.SnakeBeta(8, alpha_logscale=True)
    with torch.no_grad():
        ref_sb.alpha.copy_(torch.randn(8) * 0.2)
        ref_sb.beta.copy_(torch.randn(8) * 0.2)
    ref_mod = ref_act1d.Activation1d(ref_sb)
    x = rng.standard_normal((2, 8, 64)).astype(np.float32)
    with torch.no_grad():
        golden = t2n(ref_mod(torch.from_numpy(x)))

    up, down = UpSample1d(2), DownSample1d(2)
    params = {"params": {"alpha": t2n(ref_sb.alpha), "beta": t2n(ref_sb.beta)}}
    xl = x.transpose(0, 2, 1)
    y = up(xl)
    y = SnakeBeta(8, alpha_logscale=True).apply(params, y)
    y = np.asarray(down(y))
    np.testing.assert_allclose(y.transpose(0, 2, 1), golden, atol=ATOL)


def test_wavenet_diffusion_pathway_parity(rng):
    """is_diffusion WaveNet (t embedding + per-block projection), ref :14-28."""
    torch.manual_seed(3)
    ref = ref_wavenet.WaveNet(
        input_channels=8,
        residual_channels=16,
        residual_layers=2,
        dilation_cycle=4,
        is_diffusion=True,
        condition_channels=16,
    ).eval()
    sd = {k: t2n(v) for k, v in ref.state_dict().items()}

    params = wavenet_params_from_torch(ref, 2, True, False, True)["params"]
    params["mlp_0"] = {"kernel": tc.dense_kernel(sd["mlp.0.linear.weight"])}
    params["mlp_1"] = {"kernel": tc.dense_kernel(sd["mlp.2.linear.weight"])}
    for i in range(2):
        params[f"layer_{i}"]["diffusion_projection"] = {
            "kernel": tc.dense_kernel(
                sd[f"residual_layers.{i}.diffusion_projection.linear.weight"]
            )
        }

    x = rng.standard_normal((2, 8, 24)).astype(np.float32)
    cond = rng.standard_normal((2, 16, 24)).astype(np.float32)
    t = np.array([3.0, 17.0], np.float32)
    with torch.no_grad():
        want = t2n(
            ref(
                torch.from_numpy(x),
                t=torch.from_numpy(t),
                condition=torch.from_numpy(cond),
            )
        )
    model = WaveNet(
        input_channels=8,
        residual_channels=16,
        residual_layers=2,
        condition_channels=16,
        is_diffusion=True,
    )
    got = model.apply(
        {"params": params},
        x.transpose(0, 2, 1),
        cond.transpose(0, 2, 1),
        jnp.asarray(t),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=ATOL
    )
