"""LM fit loop: token-grid batches -> jitted LM train step (C2/C10 glue)."""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.parallel import data_mesh, shard_batch
from dmel_codec_tpu.train.checkpoint import CheckpointManager
from dmel_codec_tpu.train.lm_trainer import LMTrainer, LMTrainState, LoRATrainState
from dmel_codec_tpu.train.loop import FitConfig
from dmel_codec_tpu.utils.logging import MetricsWriter, RankedLogger

log = RankedLogger(__name__)

_BATCH_KEYS = ("text_tokens", "audio_tokens", "text_labels", "audio_labels", "valid")


class LMFitLoop:
    def __init__(
        self,
        trainer: LMTrainer,
        train_batches: Callable[[int], Iterable[dict]],
        val_batches: Optional[Callable[[], Iterable[dict]]] = None,
        fit_config: FitConfig = FitConfig(),
    ):
        self.trainer = trainer
        self.train_batches = train_batches
        self.val_batches = val_batches
        self.cfg = fit_config

    def _device_batch(self, batch: dict) -> dict:
        return {k: jnp.asarray(batch[k]) for k in _BATCH_KEYS}

    def run(self, state: Optional[LMTrainState] = None) -> LMTrainState:
        cfg = self.cfg
        mesh = data_mesh() if cfg.use_mesh else None
        writer = MetricsWriter(cfg.log_dir)
        ckpt = CheckpointManager(
            cfg.ckpt_dir,
            max_to_keep=cfg.keep_checkpoints,
            best_metric=cfg.best_metric,
            best_mode=cfg.best_mode,
        )

        if state is None:
            state = self.trainer.init_state(jax.random.PRNGKey(cfg.seed))
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = restored
            log.info(f"resumed from checkpoint step {int(state.step)}")

        # LoRA finetune states train through the adapter-only step; the
        # checkpoints they produce contain base+adapters (restoring just
        # the `lora` subtree is the reference's LoRA-only checkpoint)
        is_lora = isinstance(state, LoRATrainState)
        if is_lora:
            step_fn = self.trainer.jit_lora_train_step(mesh)
        else:
            # the loop never reuses the pre-step state, so donate its
            # buffers: without this the 0.5 B flagship's ~10.4 GB f32
            # state double-buffers and cannot step on one 16 GB chip
            step_fn = self.trainer.jit_train_step(mesh, donate=True)
        eval_fn = jax.jit(self.trainer.eval_metrics)

        step = int(state.step)
        epoch = 0
        while step < cfg.max_steps:
            for batch in self.train_batches(epoch):
                db = self._device_batch(batch)
                if mesh is not None:
                    db = shard_batch(db, mesh)
                state, metrics = step_fn(state, db)
                step = int(state.step)
                if step % cfg.log_every == 0:
                    writer.scalars(step, {k: float(v) for k, v in metrics.items()})
                if step % cfg.val_interval == 0:
                    val_means = None
                    if self.val_batches is not None:
                        # losses + top-k accuracies, reference val parity
                        # (lm_lit_modules.py:305-326)
                        sums: dict = {}
                        count = 0
                        eval_params = (
                            self.trainer.merged_lora_params(state)
                            if is_lora
                            else state.params
                        )
                        for i, vb in enumerate(self.val_batches()):
                            if i >= cfg.max_val_batches:
                                break
                            m = eval_fn(eval_params, self._device_batch(vb))
                            for k, v in m.items():
                                sums[k] = sums.get(k, 0.0) + float(v)
                            count += 1
                        if count:
                            val_means = {k: v / count for k, v in sums.items()}
                            writer.scalars(step, val_means)
                            log.info(
                                f"step {step}: val loss "
                                f"{val_means['val/audio_loss']:.4f} top1 "
                                f"{val_means.get('val/audio_top1_acc', 0.0):.3f}"
                            )
                    # checkpoint cadence == val cadence; val metrics rank it
                    ckpt.save(step, state, metrics=val_means)
                if step >= cfg.max_steps:
                    break
            epoch += 1
        if ckpt.latest_step() != step:
            ckpt.save(step, state)
        ckpt.wait()
        writer.close()
        return state
