"""BigVGAN golden parity: flax vs reference torch on identical weights."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import tests.reference_import  # noqa: F401
from dmel_codec.models.modules.bigvgan.bigvgan import BigVGAN as RefBigVGAN
from dmel_codec.models.modules.bigvgan.env import AttrDict

from dmel_codec_tpu.models.bigvgan import (
    BigVGAN,
    BigVGANConfig,
    params_from_torch_state_dict,
)

TINY = dict(
    num_mels=8,
    upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    snake_logscale=True,
    use_bias_at_final=False,
    use_tanh_at_final=False,
)


def _ref_model(resblock: str, activation: str) -> RefBigVGAN:
    h = AttrDict(
        **{
            **{k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()},
            "resblock": resblock,
            "activation": activation,
        }
    )
    torch.manual_seed(0)
    return RefBigVGAN(h=h).eval()


@pytest.mark.parametrize(
    "resblock,activation",
    [("1", "snakebeta"), ("2", "snake"), ("1", "snake")],
)
def test_bigvgan_matches_reference(rng, resblock, activation):
    ref = _ref_model(resblock, activation)
    cfg = BigVGANConfig(**TINY, resblock=resblock, activation=activation)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = params_from_torch_state_dict(sd, cfg)

    mel = rng.standard_normal((2, 16, cfg.num_mels)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0, :]

    got = BigVGAN(config=cfg).apply({"params": params}, jnp.asarray(mel))
    assert got.shape == want.shape == (2, 16 * cfg.hop_total)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def test_bigvgan_flagship_config_builds():
    """Full-size generator initialises and has the right upsample factor."""
    cfg = BigVGANConfig()
    assert cfg.hop_total == 256
    model = BigVGAN(config=cfg)
    import jax

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, cfg.num_mels)))
    out = model.apply(params, jnp.zeros((1, 4, cfg.num_mels)))
    assert out.shape == (1, 4 * 256)


@pytest.mark.parametrize(
    "initial_ch,min_ch",
    [(32, 128), (64, 20)],  # merge from stage 0 / merge mid-way (stage 1)
)
def test_bigvgan_merged_batch_layout_matches(rng, initial_ch, min_ch):
    """merge_small_channels folds batch into lanes from the first small-C
    stage (grouped convs + tiled-param acts) — same params, same output."""
    import jax

    base = dict(TINY, upsample_initial_channel=initial_ch)
    cfg = BigVGANConfig(**base, resblock="1", activation="snakebeta")
    cfg_m = BigVGANConfig(
        **base,
        resblock="1",
        activation="snakebeta",
        merge_small_channels=True,
        merge_min_channels=min_ch,
    )
    mel = jnp.asarray(rng.standard_normal((3, 16, cfg.num_mels)), jnp.float32)
    params = BigVGAN(config=cfg).init(jax.random.PRNGKey(1), mel)
    want = BigVGAN(config=cfg).apply(params, mel)
    got = BigVGAN(config=cfg_m).apply(params, mel)  # identical param tree
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bigvgan_partial_fold_matches(rng):
    """Per-stage partial folds (smallest batch divisor g whose g*C fills
    the 128-lane tile, else the best-utilisation divisor) produce the same
    output as unmerged, including across a stage-to-stage refold."""
    import jax

    from dmel_codec_tpu.models.bigvgan import _fold, _fold_factor, _unfold

    # fold planner: exact-fill folds and fallbacks
    assert _fold_factor(16, 96) == 4
    assert _fold_factor(16, 48) == 8
    assert _fold_factor(16, 24) == 16
    assert _fold_factor(3, 16) == 3  # no exact fill: best utilisation
    assert _fold_factor(1, 24) == 1

    x = jnp.asarray(rng.standard_normal((4, 5, 6)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_unfold(_fold(x, 2), 2)), np.asarray(x))

    base = dict(TINY, upsample_initial_channel=64)
    cfg = BigVGANConfig(**base, resblock="1", activation="snake")
    cfg_m = BigVGANConfig(
        **base,
        resblock="1",
        activation="snake",
        merge_small_channels=True,
        merge_min_channels=1024,  # every stage folds
    )
    mel = jnp.asarray(rng.standard_normal((4, 16, cfg.num_mels)), jnp.float32)
    params = BigVGAN(config=cfg).init(jax.random.PRNGKey(2), mel)
    want = BigVGAN(config=cfg).apply(params, mel)
    got = BigVGAN(config=cfg_m).apply(params, mel)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_from_pretrained_resolves_hub_id_from_cache(tmp_path):
    """from_pretrained accepts an HF-hub id and resolves it through the
    local hub cache with zero egress (ref bigvgan.py:420-499), returning
    the same model as the local-dir path."""
    import json

    from dmel_codec_tpu.models.bigvgan import from_pretrained

    resblock, activation = "1", "snakebeta"
    ref = _ref_model(resblock, activation)
    h = {
        **{k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()},
        "resblock": resblock,
        "activation": activation,
    }

    # local release dir
    local = tmp_path / "release"
    local.mkdir()
    (local / "config.json").write_text(json.dumps(h))
    torch.save({"generator": ref.state_dict()}, local / "bigvgan_generator.pt")

    # the same release laid out as an HF hub cache snapshot
    cache = tmp_path / "hub"
    repo = cache / "models--fake-org--tiny-bigvgan"
    rev = "0" * 40
    (repo / "refs").mkdir(parents=True)
    (repo / "refs" / "main").write_text(rev)
    snap = repo / "snapshots" / rev
    snap.mkdir(parents=True)
    (snap / "config.json").write_text(json.dumps(h))
    torch.save({"generator": ref.state_dict()}, snap / "bigvgan_generator.pt")

    model_a, params_a = from_pretrained(str(local))
    model_b, params_b = from_pretrained(
        "fake-org/tiny-bigvgan", cache_dir=str(cache), local_files_only=True
    )
    assert model_a.config == model_b.config
    mel = jnp.zeros((1, 8, model_a.config.num_mels))
    a = model_a.apply({"params": params_a}, mel)
    b = model_b.apply({"params": params_b}, mel)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
