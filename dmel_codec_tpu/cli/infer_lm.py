"""Text-prompt -> waveform inference (reference inference_lm.py:11-25).

    python -m dmel_codec_tpu.cli.infer_lm --config configs/lm_infer.yaml \
        --prompt "hello there" --out out.wav
"""

from __future__ import annotations

import argparse

import jax
import numpy as np
from scipy.io import wavfile

from dmel_codec_tpu.cli.common import build_lm_config, load_codec_adapter
from dmel_codec_tpu.lm.generate import InferenceConfig, SlowFastGenerator
from dmel_codec_tpu.lm.inputs import TokenGridBuilder
from dmel_codec_tpu.lm.tokenizer import load_text_tokenizer
from dmel_codec_tpu.models.lm import ChatMusicLM, SlowFastLMConfig
from dmel_codec_tpu.train.checkpoint import CheckpointManager
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer
from dmel_codec_tpu.utils.config import dataclass_from_dict, load_yaml
from dmel_codec_tpu.utils.logging import RankedLogger

log = RankedLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description="LM text-prompt inference")
    parser.add_argument("--config", required=True)
    parser.add_argument("--prompt", default=None)
    parser.add_argument("--out", default="generated.wav")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    cfg = load_yaml(args.config)
    prompt = args.prompt or cfg.get("prompt", "who are you?")

    lm_cfg = build_lm_config(cfg)
    trainer = LMTrainer(lm_cfg, LMTrainConfig())
    abstract = trainer.init_state(jax.random.PRNGKey(0))
    restored = CheckpointManager(cfg["lm_ckpt_dir"]).restore_latest_fields(
        abstract, ("params",)
    )
    if restored is None:
        raise FileNotFoundError(f"no LM checkpoint under {cfg['lm_ckpt_dir']}")

    from dmel_codec_tpu.models.codec import DMelCodecConfig

    codec = load_codec_adapter(
        cfg["codec_ckpt_dir"],
        codec_cfg=dataclass_from_dict(DMelCodecConfig, cfg.get("model")),
        vocoder_ckpt=cfg.get("vocoder_ckpt"),
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
    icfg = dataclass_from_dict(InferenceConfig, cfg.get("inference"))

    text_ids = tokenizer.encode(prompt)
    text_t, audio_t = builder.build_infer_grid(text_ids=text_ids)
    gen = SlowFastGenerator(ChatMusicLM(config=lm_cfg), restored["params"], icfg)
    audio_ids, _ = gen.generate(text_t, audio_t, jax.random.PRNGKey(args.seed))
    if audio_ids.shape[0] <= 1:
        log.info("model generated no audio frames")
        return

    raw = gen.deshift(audio_ids[:-1])  # drop the <EOM> frame (ref :461)
    raw = np.clip(raw, 0, lm_cfg.audio_codebook_size - 1)
    indices = raw.T[None, :, :]  # [1, C, T]
    wav, _ = codec.decode(indices)
    if wav.size:
        wavfile.write(args.out, codec.sample_rate, np.asarray(wav[0], np.float32))
        log.info(f"wrote {args.out} ({wav.shape[-1] / codec.sample_rate:.2f} s)")
    else:
        log.info("no vocoder configured — decode produced mel only")


if __name__ == "__main__":
    main()
