"""Prompted LM inference -> waveform (reference inference_lm.py:11-25).

Supports all three prompt grids of the reference's ProcessInputs
(lm_process_input.py:149-259): text-only, audio-only, and mixed
text+audio (the audio prompt is tokenized through the codec, as
lm_process_input.py:30-49 does).

    python -m dmel_codec_tpu.cli.infer_lm --config configs/lm_infer.yaml \
        --prompt "hello there" [--prompt-audio clip.wav] --out out.wav
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
    parser.add_argument(
        "--prompt-audio",
        default=None,
        help="WAV file to tokenize through the codec as an audio prompt "
        "(alone or combined with --prompt)",
    )
    parser.add_argument("--out", default="generated.wav")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    cfg = load_yaml(args.config)
    prompt_audio = args.prompt_audio or cfg.get("prompt_audio")
    prompt = args.prompt or cfg.get("prompt")
    if prompt is None and prompt_audio is None:
        prompt = "who are you?"

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

    audio_prompt_ids = None
    if prompt_audio is not None:
        from dmel_codec_tpu.data.audio import load_audio

        wav_prompt = load_audio(prompt_audio, target_sr=codec.sample_rate)
        indices, idx_lengths = codec.encode(wav_prompt[None, :])
        # [1, C, L] -> [L, C] raw codec ids (builder applies the id shift)
        audio_prompt_ids = np.asarray(indices)[0, :, : int(idx_lengths[0])].T
        log.info(
            f"audio prompt: {len(wav_prompt) / codec.sample_rate:.2f} s -> "
            f"{audio_prompt_ids.shape[0]} frames"
        )

    text_ids = tokenizer.encode(prompt) if prompt is not None else None
    text_t, audio_t = builder.build_infer_grid(
        text_ids=text_ids, audio_ids=audio_prompt_ids
    )
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
