"""Codec evaluation entry point (reference evaluation/evaluation.py:162-194).

    python -m dmel_codec_tpu.cli.evaluate --config configs/eval.yaml
"""

from __future__ import annotations

import argparse
import json

from dmel_codec_tpu.cli.common import load_codec_adapter
from dmel_codec_tpu.data.loader import DataLoader
from dmel_codec_tpu.data.manifest import load_manifest
from dmel_codec_tpu.eval.evaluation import Evaluation


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate codec reconstruction")
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-batches", type=int, default=None)
    args = parser.parse_args(argv)

    from dmel_codec_tpu.models.codec import DMelCodecConfig
    from dmel_codec_tpu.utils.config import dataclass_from_dict, load_yaml

    cfg = load_yaml(args.config)
    codec_cfg = dataclass_from_dict(DMelCodecConfig, cfg.get("model"))
    codec = load_codec_adapter(
        cfg["codec_ckpt_dir"],
        codec_cfg=codec_cfg,
        vocoder_ckpt=cfg.get("vocoder_ckpt"),
    )

    cuts = load_manifest(cfg["test_manifest"])
    loader = DataLoader(
        cuts, max_duration=cfg.get("max_duration", 30.0), shuffle=False
    )
    batches = iter(loader)
    if args.max_batches:
        import itertools

        batches = itertools.islice(batches, args.max_batches)

    asr = None
    if cfg.get("whisper_path"):
        from dmel_codec_tpu.eval.external import WhisperASR

        asr = WhisperASR(cfg["whisper_path"])

    result = Evaluation(
        codec,
        asr=asr,
        compute_pesq=cfg.get("compute_pesq", False),
        compute_spk_sim=cfg.get("compute_spk_sim", False),
    ).run(batches)
    print(json.dumps(result.means, indent=2))


if __name__ == "__main__":
    main()
