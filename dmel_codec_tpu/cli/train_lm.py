"""Slow-fast LM training entry point (reference train_lm.py:12-54).

    python -m dmel_codec_tpu.cli.train_lm --config configs/lm.yaml

Needs a trained codec checkpoint (orbax CodecTrainState dir) to tokenize
audio; optionally a HF Qwen2-0.5B safetensors dir for foundation weights
and a HF tokenizer path (byte-tokenizer fallback otherwise).
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

from dmel_codec_tpu.cli.common import load_codec_adapter
from dmel_codec_tpu.data.loader import DataLoader
from dmel_codec_tpu.data.manifest import load_manifest
from dmel_codec_tpu.lm.data import lm_batch_from_audio
from dmel_codec_tpu.lm.inputs import TokenGridBuilder
from dmel_codec_tpu.lm.tokenizer import load_text_tokenizer
from dmel_codec_tpu.cli.common import build_lm_config
from dmel_codec_tpu.models.lm import load_qwen2_foundation
from dmel_codec_tpu.train.lm_loop import LMFitLoop
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer, LMTrainState
from dmel_codec_tpu.train.loop import FitConfig
from dmel_codec_tpu.utils.config import dataclass_from_dict, load_yaml, print_config_tree
from dmel_codec_tpu.utils.logging import RankedLogger

log = RankedLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train the slow-fast LM")
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: jax.distributed.initialize before touching devices "
        "(rendezvous details come from the config's `distributed:` section "
        "or pod auto-detection)",
    )
    args = parser.parse_args(argv)

    cfg = load_yaml(args.config)
    log.info("config:\n" + print_config_tree(cfg))

    from dmel_codec_tpu.parallel.multihost import DistributedConfig, initialize

    dist_cfg = dataclass_from_dict(DistributedConfig, cfg.get("distributed"))
    if args.distributed:
        dist_cfg = dataclasses.replace(dist_cfg, enabled=True)
    initialize(dist_cfg)

    lm_cfg = build_lm_config(cfg)
    train_cfg = dataclass_from_dict(LMTrainConfig, cfg.get("train"))
    fit_cfg = dataclass_from_dict(FitConfig, cfg.get("fit"))
    data = cfg.get("data", {})

    from dmel_codec_tpu.models.codec import DMelCodecConfig

    codec = load_codec_adapter(
        cfg["codec_ckpt_dir"],
        codec_cfg=dataclass_from_dict(DMelCodecConfig, cfg.get("codec_model")),
    )
    tokenizer = load_text_tokenizer(cfg.get("text_tokenizer_path"))
    builder = TokenGridBuilder(
        config=lm_cfg,
        max_length=cfg.get("max_length", 4096),
        silence_length=cfg.get("silence_length", 3),
        audio_silence_id=tuple(
            cfg.get("audio_silence_id", (0, 0, 29, 174, 0, 6, 0, 146, 146, 6))
        ),
    )

    train_cuts = load_manifest(data["train_manifest"])
    n_shards, shard = jax.process_count(), jax.process_index()
    batch_multiple = jax.device_count() if fit_cfg.use_mesh else 1

    def train_batches(epoch):
        loader = DataLoader(
            train_cuts,
            max_duration=data.get("max_duration", 80.0),
            seed=data.get("seed", 0),
            num_shards=n_shards,
            shard_index=shard,
            batch_multiple=batch_multiple,
        )
        for audio_batch in loader.epoch(epoch):
            yield lm_batch_from_audio(codec, builder, tokenizer, audio_batch)

    trainer = LMTrainer(lm_cfg, train_cfg)
    state = trainer.init_state(jax.random.PRNGKey(fit_cfg.seed))
    if cfg.get("text_foundation_model_path"):
        from safetensors.numpy import load_file

        sd = load_file(cfg["text_foundation_model_path"])
        params = load_qwen2_foundation(state.params, sd, lm_cfg)
        state = LMTrainState(step=state.step, params=params, opt_state=state.opt_state)
        log.info("loaded Qwen2 foundation weights into the slow model")

    if cfg.get("lora"):
        # adapter-only finetune (a real version of the reference's
        # declared-but-unimplemented use_lora, lm_lit_modules.py:371-381)
        from dmel_codec_tpu.train.lora import LoRAConfig, lora_param_count

        lora_cfg = dataclass_from_dict(LoRAConfig, cfg["lora"])
        state = trainer.init_lora_state(
            jax.random.PRNGKey(fit_cfg.seed), lora_cfg, base_params=state.params
        )
        log.info(
            f"LoRA finetune: rank {lora_cfg.rank}, "
            f"{lora_param_count(state.lora):,} trainable adapter params"
        )

    LMFitLoop(trainer, train_batches, None, fit_cfg).run(state)


if __name__ == "__main__":
    main()
