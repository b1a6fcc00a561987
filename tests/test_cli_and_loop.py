"""Integration: config system, codec fit loop via the CLI, resume, LM loop."""

import json
import os

import numpy as np
import pytest
import yaml
from scipy.io import wavfile

from dmel_codec_tpu.utils.config import (
    dataclass_from_dict,
    load_yaml,
    merge_dicts,
)
from dmel_codec_tpu.models.codec import DMelCodecConfig


def test_config_yaml_roundtrip(tmp_path):
    base = {"model": {"n_mels": 80}, "train": {"learning_rate": 1e-3}}
    override = {"train": {"learning_rate": 5e-4}, "fit": {"max_steps": 10}}
    with open(tmp_path / "base.yaml", "w") as f:
        yaml.safe_dump(base, f)
    with open(tmp_path / "main.yaml", "w") as f:
        yaml.safe_dump({"defaults": ["base.yaml", "_self_"], **override}, f)
    cfg = load_yaml(str(tmp_path / "main.yaml"))
    assert cfg["model"]["n_mels"] == 80
    assert cfg["train"]["learning_rate"] == 5e-4  # _self_ wins over defaults
    assert cfg["fit"]["max_steps"] == 10

    mc = dataclass_from_dict(
        DMelCodecConfig, {"n_mels": 80, "levels": [8, 6], "dmel_groups": 8}
    )
    assert mc.levels == (8, 6) and mc.n_mels == 80
    with pytest.raises(KeyError, match="unknown config keys"):
        dataclass_from_dict(DMelCodecConfig, {"nope": 1})


def test_interpolation(tmp_path):
    with open(tmp_path / "c.yaml", "w") as f:
        yaml.safe_dump({"sample_rate": 24000, "model": {"sr": "${sample_rate}"}}, f)
    cfg = load_yaml(str(tmp_path / "c.yaml"))
    assert cfg["model"]["sr"] == 24000


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(4):
        n = 24000 // 4  # 0.25 s
        data = (rng.standard_normal(n) * 0.2 * 32767).astype(np.int16)
        wavfile.write(str(wav_dir / f"u{i}.wav"), 24000, data)
    from dmel_codec_tpu.data.preprocess import cuts_from_dir, prepare_manifests

    manifest = str(tmp_path / "cuts.jsonl.gz")
    prepare_manifests(cuts_from_dir(str(wav_dir)), manifest, shuffle_seed=0)
    return manifest


def test_train_codec_cli_end_to_end_with_resume(tmp_path, tiny_dataset):
    from dmel_codec_tpu.cli.train_codec import main

    config = {
        "model": {
            "encoder_residual_channels": 12,
            "encoder_layers": 2,
            "decoder_layers": 2,
        },
        "train": {"num_warmup_steps": 1, "num_training_steps": 100},
        "fit": {
            "max_steps": 2,
            "val_interval": 2,
            "log_every": 1,
            "ckpt_dir": str(tmp_path / "ckpt"),
            "log_dir": str(tmp_path / "logs"),
            "use_mesh": False,
        },
        "data": {
            "train_manifest": tiny_dataset,
            "val_manifest": tiny_dataset,
            "max_duration": 1.0,
            "val_max_duration": 0.5,
        },
    }
    cfg_path = str(tmp_path / "codec.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    main(["--config", cfg_path])

    # metrics were written
    metrics_file = tmp_path / "logs" / "metrics.jsonl"
    lines = [json.loads(l) for l in open(metrics_file)]
    assert any("train/generator/loss" in l for l in lines)
    assert any("val_loss" in l for l in lines)
    # checkpoint exists
    from dmel_codec_tpu.train.checkpoint import CheckpointManager

    assert CheckpointManager(str(tmp_path / "ckpt")).latest_step() == 2

    # resume: raising max_steps continues from step 2
    config["fit"]["max_steps"] = 3
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    main(["--config", cfg_path])
    assert CheckpointManager(str(tmp_path / "ckpt")).latest_step() == 3


def test_flagship_configs_parse():
    for name in ["codec.yaml", "lm.yaml", "lm_infer.yaml", "eval.yaml"]:
        cfg = load_yaml(os.path.join("configs", name))
        assert isinstance(cfg, dict) and cfg

    from dmel_codec_tpu.train.codec_trainer import CodecTrainConfig
    from dmel_codec_tpu.train.loop import FitConfig

    cfg = load_yaml("configs/codec.yaml")
    assert dataclass_from_dict(DMelCodecConfig, cfg["model"]).concat_dim == 700
    assert dataclass_from_dict(CodecTrainConfig, cfg["train"]).learning_rate == 1e-5
    assert dataclass_from_dict(FitConfig, cfg["fit"]).val_interval == 8000


def test_lm_loop_with_codec_tokenization(tmp_path, tiny_dataset, rng):
    """LM data path: audio -> codec tokens -> grids -> one LM train step."""
    import jax
    import jax.numpy as jnp

    from dmel_codec_tpu.data.loader import DataLoader
    from dmel_codec_tpu.data.manifest import load_manifest
    from dmel_codec_tpu.eval.codecs import DMelCodecAdapter
    from dmel_codec_tpu.lm.data import lm_batch_from_audio
    from dmel_codec_tpu.lm.inputs import TokenGridBuilder
    from dmel_codec_tpu.lm.tokenizer import load_text_tokenizer
    from dmel_codec_tpu.models.codec import DMelCodec
    from tests.test_lm import TINY_LM
    from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer

    cfg = DMelCodecConfig(
        encoder_residual_channels=12, encoder_layers=2, decoder_layers=2
    )
    model = DMelCodec(config=cfg)
    t = 16
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, t, cfg.n_mels)),
        jnp.ones((1, t, 1)),
        jnp.zeros((1, 1)),
        jnp.zeros((1, t, cfg.concat_dim)),
    )["params"]
    adapter = DMelCodecAdapter(params, cfg)

    cuts = load_manifest(tiny_dataset)
    for i, c in enumerate(cuts):
        c.text = f"utterance number {i}"
    builder = TokenGridBuilder(config=TINY_LM)
    tokenizer = load_text_tokenizer(None)

    batch_audio = next(iter(DataLoader(cuts, max_duration=1.0, shuffle=False)))
    lm_batch = lm_batch_from_audio(adapter, builder, tokenizer, batch_audio)
    assert lm_batch["text_tokens"].shape == lm_batch["text_labels"].shape

    trainer = LMTrainer(TINY_LM, LMTrainConfig(accumulate_grad=1, num_warmup_steps=1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, metrics = trainer.jit_train_step()(
        state, {k: jnp.asarray(v) for k, v in lm_batch.items()}
    )
    assert np.isfinite(float(metrics["train/loss"]))


def test_evaluate_cli_on_trained_checkpoint(tmp_path, tiny_dataset, capsys):
    """Train 2 steps via CLI, then run the evaluate CLI on the checkpoint."""
    from dmel_codec_tpu.cli.evaluate import main as eval_main
    from dmel_codec_tpu.cli.train_codec import main as train_main

    model = {
        "encoder_residual_channels": 12,
        "encoder_layers": 2,
        "decoder_layers": 2,
    }
    train_cfg = {
        "model": model,
        "train": {"num_warmup_steps": 1, "num_training_steps": 100},
        "fit": {
            "max_steps": 1,
            "val_interval": 10,
            "ckpt_dir": str(tmp_path / "ckpt"),
            "log_dir": str(tmp_path / "logs"),
            "use_mesh": False,
        },
        "data": {"train_manifest": tiny_dataset, "max_duration": 1.0},
    }
    with open(tmp_path / "train.yaml", "w") as f:
        yaml.safe_dump(train_cfg, f)
    train_main(["--config", str(tmp_path / "train.yaml")])

    eval_cfg = {
        "model": model,
        "codec_ckpt_dir": str(tmp_path / "ckpt"),
        "test_manifest": tiny_dataset,
        "max_duration": 2.0,
    }
    with open(tmp_path / "eval.yaml", "w") as f:
        yaml.safe_dump(eval_cfg, f)
    eval_main(["--config", str(tmp_path / "eval.yaml"), "--max-batches", "1"])
    out = capsys.readouterr().out
    result = json.loads(out[out.index("{"):])
    assert "mel_l1" in result and np.isfinite(result["mel_l1"])


def test_train_lm_and_infer_lm_cli_end_to_end(tmp_path, tiny_dataset):
    """codec ckpt -> LM training CLI (tiny sizes) -> LM inference CLI."""
    from dmel_codec_tpu.cli.infer_lm import main as infer_main
    from dmel_codec_tpu.cli.train_codec import main as codec_main
    from dmel_codec_tpu.cli.train_lm import main as lm_main

    codec_model = {
        "encoder_residual_channels": 12,
        "encoder_layers": 2,
        "decoder_layers": 2,
    }
    codec_cfg = {
        "model": codec_model,
        "train": {"num_warmup_steps": 1, "num_training_steps": 100},
        "fit": {
            "max_steps": 1,
            "val_interval": 10,
            "ckpt_dir": str(tmp_path / "codec_ckpt"),
            "log_dir": str(tmp_path / "codec_logs"),
            "use_mesh": False,
        },
        "data": {"train_manifest": tiny_dataset, "max_duration": 1.0},
    }
    with open(tmp_path / "codec.yaml", "w") as f:
        yaml.safe_dump(codec_cfg, f)
    codec_main(["--config", str(tmp_path / "codec.yaml")])

    tiny_lm = {
        "slow_lm": {
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_layers": 2,
            "num_heads": 4,
            "num_kv_heads": 2,
        },
        "fast_lm": {
            "hidden_size": 24,
            "intermediate_size": 48,
            "num_layers": 2,
            "num_heads": 4,
            "num_kv_heads": 2,
        },
    }
    lm_cfg = {
        "codec_ckpt_dir": str(tmp_path / "codec_ckpt"),
        "codec_model": codec_model,
        **tiny_lm,
        "train": {"accumulate_grad": 1, "num_warmup_steps": 1},
        "fit": {
            "max_steps": 2,
            "val_interval": 100,
            "log_every": 1,
            "ckpt_dir": str(tmp_path / "lm_ckpt"),
            "log_dir": str(tmp_path / "lm_logs"),
            "use_mesh": False,
        },
        "data": {"train_manifest": tiny_dataset, "max_duration": 1.0},
    }
    with open(tmp_path / "lm.yaml", "w") as f:
        yaml.safe_dump(lm_cfg, f)
    lm_main(["--config", str(tmp_path / "lm.yaml")])

    from dmel_codec_tpu.train.checkpoint import CheckpointManager

    assert CheckpointManager(str(tmp_path / "lm_ckpt")).latest_step() == 2

    infer_cfg = {
        "lm_ckpt_dir": str(tmp_path / "lm_ckpt"),
        "codec_ckpt_dir": str(tmp_path / "codec_ckpt"),
        "model": codec_model,
        **tiny_lm,
        "inference": {"max_new_tokens": 3, "max_seq_len": 64},
    }
    with open(tmp_path / "infer.yaml", "w") as f:
        yaml.safe_dump(infer_cfg, f)
    infer_main(
        [
            "--config",
            str(tmp_path / "infer.yaml"),
            "--prompt",
            "hi",
            "--out",
            str(tmp_path / "out.wav"),
        ]
    )

    # audio-prompt and mixed text+audio prompt grids through the same CLI
    # (reference lm_process_input.py:149-259 / VERDICT r1 Next #8)
    wav_prompt = str(tmp_path / "wavs" / "u0.wav")
    infer_main(
        [
            "--config",
            str(tmp_path / "infer.yaml"),
            "--prompt-audio",
            wav_prompt,
            "--out",
            str(tmp_path / "out_audio_prompt.wav"),
        ]
    )
    infer_main(
        [
            "--config",
            str(tmp_path / "infer.yaml"),
            "--prompt",
            "hi",
            "--prompt-audio",
            wav_prompt,
            "--out",
            str(tmp_path / "out_mixed_prompt.wav"),
        ]
    )
