"""Codec GAN training entry point (reference train_codec.py:12-70).

    python -m dmel_codec_tpu.cli.train_codec --config configs/codec.yaml

YAML sections: model (DMelCodecConfig), train (CodecTrainConfig),
fit (FitConfig), data {train_manifest, val_manifest, max_duration,
val_max_duration, seed}. Auto-resumes from the newest checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

from dmel_codec_tpu.data.loader import DataLoader
from dmel_codec_tpu.data.manifest import load_manifest
from dmel_codec_tpu.models.codec import DMelCodecConfig
from dmel_codec_tpu.train.codec_trainer import CodecTrainConfig, CodecTrainer
from dmel_codec_tpu.train.loop import CodecFitLoop, FitConfig
from dmel_codec_tpu.utils.config import dataclass_from_dict, load_yaml, print_config_tree
from dmel_codec_tpu.utils.logging import RankedLogger

log = RankedLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train the dMel codec (GAN)")
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

    codec_cfg = dataclass_from_dict(DMelCodecConfig, cfg.get("model"))
    train_cfg = dataclass_from_dict(CodecTrainConfig, cfg.get("train"))
    fit_cfg = dataclass_from_dict(FitConfig, cfg.get("fit"))
    data = cfg.get("data", {})

    n_shards = jax.process_count()
    shard = jax.process_index()
    train_cuts = load_manifest(data["train_manifest"])

    batch_multiple = jax.device_count() if fit_cfg.use_mesh else 1

    def train_batches(epoch):
        return DataLoader(
            train_cuts,
            sample_rate=codec_cfg.sample_rate,
            max_duration=data.get("max_duration", 210.0),
            seed=data.get("seed", 0),
            num_shards=n_shards,
            shard_index=shard,
            batch_multiple=batch_multiple,
        ).epoch(epoch)

    val_batches = None
    if data.get("val_manifest"):
        val_cuts = load_manifest(data["val_manifest"])

        def val_batches():
            return iter(
                DataLoader(
                    val_cuts,
                    sample_rate=codec_cfg.sample_rate,
                    max_duration=data.get("val_max_duration", 4.0),
                    shuffle=False,
                )
            )

    trainer = CodecTrainer(codec_cfg, train_cfg)
    loop = CodecFitLoop(trainer, train_batches, val_batches, fit_cfg)
    loop.run()


if __name__ == "__main__":
    main()
