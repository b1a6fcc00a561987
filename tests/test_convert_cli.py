"""Checkpoint conversion CLI: VQGAN torch ckpt -> orbax -> evaluate."""

import numpy as np
import pytest
import torch
import yaml

import tests.reference_import  # noqa: F401


def test_vqgan_convert_roundtrip(tmp_path, rng):
    from tests.test_codec_convert import CFG, _full_fake_state_dict

    sd, *_ = _full_fake_state_dict(rng)
    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        ckpt_path,
    )

    cfg_yaml = str(tmp_path / "model.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump(
            {
                "model": {
                    "encoder_layers": CFG.encoder_layers,
                    "decoder_layers": CFG.decoder_layers,
                }
            },
            f,
        )

    from dmel_codec_tpu.cli.convert import main

    out_dir = str(tmp_path / "orbax")
    main(["vqgan", "--ckpt", ckpt_path, "--out", out_dir, "--config", cfg_yaml])

    # restored state drives the adapter end-to-end
    from dmel_codec_tpu.cli.common import load_codec_adapter

    adapter = load_codec_adapter(out_dir, codec_cfg=CFG)
    x = rng.standard_normal((1, 256 * 16)).astype(np.float32) * 0.1
    idx, lengths = adapter.encode(x)
    assert idx.shape[1] == CFG.num_codebook_rows

    # converted weights survive the orbax round trip exactly
    import jax

    enc_kernel = adapter.params["encoder"]["layer_0"]["conv"]["kernel"]
    from dmel_codec_tpu.utils.torch_compat import conv1d_kernel

    want = conv1d_kernel(np.asarray(sd["encoder.residual_layers.0.conv_layer.conv.weight"]))
    np.testing.assert_array_equal(np.asarray(enc_kernel), want)
