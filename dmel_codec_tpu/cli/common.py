"""Shared CLI helpers: checkpoint -> adapter/params loading."""

from __future__ import annotations

from typing import Optional

import jax

from dmel_codec_tpu.eval.codecs import DMelCodecAdapter
from dmel_codec_tpu.models.bigvgan import BigVGANConfig, load_torch_checkpoint
from dmel_codec_tpu.models.codec import DMelCodecConfig
from dmel_codec_tpu.train.checkpoint import CheckpointManager
from dmel_codec_tpu.train.codec_trainer import CodecTrainConfig, CodecTrainer


def load_codec_params(ckpt_dir: str, codec_cfg: Optional[DMelCodecConfig] = None):
    """Restore just the generator params from the newest codec checkpoint
    (optimizer-state structure depends on the training configuration, which
    the serving side need not replicate)."""
    trainer = CodecTrainer(codec_cfg or DMelCodecConfig(), CodecTrainConfig())
    abstract = trainer.init_state(jax.random.PRNGKey(0))
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore_latest_fields(abstract, ("gen_params",))
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found under {ckpt_dir}")
    return restored["gen_params"]


def load_codec_adapter(
    ckpt_dir: str,
    codec_cfg: Optional[DMelCodecConfig] = None,
    vocoder_ckpt: Optional[str] = None,
    vocoder_cfg: Optional[BigVGANConfig] = None,
) -> DMelCodecAdapter:
    gen_params = load_codec_params(ckpt_dir, codec_cfg)
    vocoder_params = None
    if vocoder_ckpt:
        vocoder_cfg = vocoder_cfg or BigVGANConfig()
        vocoder_params = load_torch_checkpoint(vocoder_ckpt, vocoder_cfg)
    return DMelCodecAdapter(
        gen_params,
        codec_cfg or DMelCodecConfig(),
        vocoder_params=vocoder_params,
        vocoder_config=vocoder_cfg,
    )


def build_lm_config(cfg: dict):
    """SlowFastLMConfig from a CLI YAML: optional `slow_lm:` / `fast_lm:`
    sections override the flagship TransformerConfigs (testing, smaller
    deployments); text/audio loss weights come from the top level."""
    import dataclasses

    from dmel_codec_tpu.models.lm import SlowFastLMConfig
    from dmel_codec_tpu.models.transformer import TransformerConfig
    from dmel_codec_tpu.utils.config import dataclass_from_dict

    kwargs = dict(
        text_weight=cfg.get("text_weight", 0.01),
        audio_weight=cfg.get("audio_weight", 1.0),
    )
    base = SlowFastLMConfig()
    if cfg.get("slow_lm"):
        kwargs["slow"] = dataclasses.replace(
            base.slow, **dataclass_from_dict_overrides(cfg["slow_lm"])
        )
    if cfg.get("fast_lm"):
        kwargs["fast"] = dataclasses.replace(
            base.fast, **dataclass_from_dict_overrides(cfg["fast_lm"])
        )
    return SlowFastLMConfig(**kwargs)


def dataclass_from_dict_overrides(d: dict) -> dict:
    """Tuple-ize list values for frozen dataclass replacement."""
    return {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
