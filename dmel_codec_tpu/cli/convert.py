"""Convert reference PyTorch checkpoints into this framework's orbax format.

    python -m dmel_codec_tpu.cli.convert vqgan   --ckpt epoch=...ckpt --out ckpt/codec
    python -m dmel_codec_tpu.cli.convert bigvgan --dir bigvgan_v2_24khz_100band_256x --out ckpt/vocoder
    python -m dmel_codec_tpu.cli.convert qwen2   --safetensors model.safetensors --out ckpt/lm

vqgan writes a CodecTrainState (fresh optimizer state, step 0) so the
training CLIs resume from it directly; bigvgan/qwen2 write the flax params
tree. Model-size overrides come from an optional --config YAML with a
`model:` section.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np
import orbax.checkpoint as ocp

from dmel_codec_tpu.models.codec import DMelCodecConfig
from dmel_codec_tpu.utils.config import dataclass_from_dict, load_yaml
from dmel_codec_tpu.utils.logging import RankedLogger

log = RankedLogger(__name__)


def _model_cfg(args) -> DMelCodecConfig:
    if getattr(args, "config", None):
        return dataclass_from_dict(DMelCodecConfig, load_yaml(args.config).get("model"))
    return DMelCodecConfig()


def convert_vqgan(args):
    from dmel_codec_tpu.models.codec_convert import load_vqgan_checkpoint
    from dmel_codec_tpu.train.checkpoint import CheckpointManager
    from dmel_codec_tpu.train.codec_trainer import CodecTrainConfig, CodecTrainer

    cfg = _model_cfg(args)
    codec_params, disc_params = load_vqgan_checkpoint(args.ckpt, cfg)
    trainer = CodecTrainer(cfg, CodecTrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(gen_params=codec_params)
    if disc_params is not None:
        state = state.replace(disc_params=disc_params)
    mgr = CheckpointManager(args.out)
    mgr.save(0, state)
    mgr.wait()
    log.info(f"wrote CodecTrainState (step 0) to {args.out}")


def convert_bigvgan(args):
    from dmel_codec_tpu.models.bigvgan import from_pretrained

    _, params = from_pretrained(args.dir)
    with ocp.StandardCheckpointer() as ckptr:
        import os

        ckptr.save(os.path.abspath(args.out), params)
    log.info(f"wrote BigVGAN params to {args.out}")


def convert_qwen2(args):
    from safetensors.numpy import load_file

    from dmel_codec_tpu.models.lm import SlowFastLMConfig, load_qwen2_foundation
    from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer

    sd = load_file(args.safetensors)
    trainer = LMTrainer(SlowFastLMConfig(), LMTrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0))
    params = load_qwen2_foundation(state.params, sd, trainer.lm_config)
    with ocp.StandardCheckpointer() as ckptr:
        import os

        ckptr.save(os.path.abspath(args.out), params)
    log.info(f"wrote ChatMusicLM params (Qwen2 foundation merged) to {args.out}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="torch -> orbax converters")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("vqgan")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--config", default=None)
    p.set_defaults(fn=convert_vqgan)

    p = sub.add_parser("bigvgan")
    p.add_argument("--dir", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=convert_bigvgan)

    p = sub.add_parser("qwen2")
    p.add_argument("--safetensors", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=convert_qwen2)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
