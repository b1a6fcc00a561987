"""Fit loops: the Lightning-Trainer replacement (C1/C2/C3-val/C27 glue).

Wires data loader -> jitted train step -> metrics/checkpoints/validation:
  * step-based loop with max_steps, val every val_interval steps
  * auto-resume from the newest orbax checkpoint (reference
    find_lastest_ckpt behavior, train_codec.py:57-63)
  * validation logs val_loss plus rich media like the reference
    validation_step (codec_lit_modules.py:330-460): mel-comparison figure
    and gt/generated audio clips (through the frozen vocoder when given)
  * data-parallel over a jax mesh; batches sharded, params replicated
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.parallel import data_mesh, shard_batch
from dmel_codec_tpu.train.checkpoint import CheckpointManager
from dmel_codec_tpu.train.codec_trainer import CodecTrainer, CodecTrainState
from dmel_codec_tpu.utils.logging import MetricsWriter, RankedLogger, plot_mel

log = RankedLogger(__name__)


@dataclasses.dataclass(frozen=True)
class FitConfig:
    max_steps: int = 1_000_000
    val_interval: int = 2000
    log_every: int = 50
    ckpt_dir: str = "checkpoints"
    log_dir: str = "tb_logs"
    keep_checkpoints: int = 2
    # Metric-ranked retention (reference ModelCheckpoint monitor/save_top_k,
    # dMel_used.yaml:135-144 / lm_config.yaml:146-156). None keeps the k
    # newest; "val_loss" (codec) / "val/audio_loss" (LM) keeps the k best.
    best_metric: Optional[str] = None
    best_mode: str = "min"
    seed: int = 0
    max_val_batches: int = 4
    use_mesh: bool = True


class CodecFitLoop:
    def __init__(
        self,
        trainer: CodecTrainer,
        train_batches: Callable[[int], Iterable[dict]],
        val_batches: Optional[Callable[[], Iterable[dict]]] = None,
        fit_config: FitConfig = FitConfig(),
        vocoder_apply: Optional[Callable] = None,
    ):
        """train_batches(epoch) / val_batches() yield
        {'audios' [B, L], 'audio_lengths' [B], ...}. vocoder_apply:
        mel [B, T, M] -> wav [B, L] (frozen BigVGAN), used for val media."""
        self.trainer = trainer
        self.train_batches = train_batches
        self.val_batches = val_batches
        self.cfg = fit_config
        self.vocoder_apply = vocoder_apply

    def _device_batch(self, batch: dict) -> dict:
        return {
            "audios": jnp.asarray(batch["audios"]),
            "audio_lengths": jnp.asarray(batch["audio_lengths"]),
        }

    def run(self, state: Optional[CodecTrainState] = None) -> CodecTrainState:
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

        step_fn = self.trainer.jit_train_step(mesh)
        self._eval_fn = jax.jit(self.trainer.eval_step)
        rng = jax.random.PRNGKey(cfg.seed + 1)

        step = int(state.step)
        epoch = 0
        while step < cfg.max_steps:
            for batch in self.train_batches(epoch):
                db = self._device_batch(batch)
                if mesh is not None:
                    db = shard_batch(db, mesh)
                state, metrics = step_fn(state, db, jax.random.fold_in(rng, step))
                step = int(state.step)
                if step % cfg.log_every == 0:
                    writer.scalars(step, {k: float(v) for k, v in metrics.items()})
                if step % cfg.val_interval == 0:
                    val_metrics = None
                    if self.val_batches is not None:
                        val_metrics = self._validate(state, writer, step)
                    # checkpoint cadence == val cadence; val metrics rank it
                    ckpt.save(step, state, metrics=val_metrics)
                if step >= cfg.max_steps:
                    break
            epoch += 1
        if ckpt.latest_step() != step:
            ckpt.save(step, state)
        ckpt.wait()
        writer.close()
        return state

    def _validate(
        self, state: CodecTrainState, writer: MetricsWriter, step: int
    ) -> Optional[dict]:
        cfg = self.cfg
        eval_fn = self._eval_fn  # jit once per run (re-wrapping would retrace)
        losses = []
        first_batch = None
        for i, batch in enumerate(self.val_batches()):
            if i >= cfg.max_val_batches:
                break
            db = self._device_batch(batch)
            out = eval_fn(state, db, jax.random.PRNGKey(cfg.seed + 2 + i))
            losses.append(float(out["val_loss"]))
            if first_batch is None:
                first_batch = db
        metrics = None
        if losses:
            metrics = {"val_loss": float(np.mean(losses))}
            writer.scalars(step, metrics)
            log.info(f"step {step}: val_loss {np.mean(losses):.4f}")
        if first_batch is not None:
            self._log_media(state, writer, step, first_batch)
        return metrics

    def _log_media(self, state, writer, step, batch):
        """Mel figure + audio clips for sample 0 (ref :399-458)."""
        trainer = self.trainer
        audios = batch["audios"][:1].astype(jnp.float32)
        lengths = batch["audio_lengths"][:1]
        encode_mels, gt_mels, mel_masks, _ = trainer._prepare(audios, lengths)
        quality = jnp.full((1, 1), 2.0)
        noise = jax.random.normal(
            jax.random.PRNGKey(0),
            encode_mels.shape[:2] + (trainer.codec_config.concat_dim,),
        )
        gen_mel, _ = trainer.codec.apply(
            {"params": state.gen_params}, encode_mels, mel_masks, quality, noise
        )
        mel_len = int(lengths[0]) // trainer.mel_transform.hop_length
        fig = plot_mel(
            [
                np.asarray(gt_mels[0, :mel_len].T),
                np.asarray(gen_mel[0, :mel_len].T),
            ],
            ["Ground-Truth", "Auxiliary"],
        )
        writer.figure(step, f"sample-0/mels", fig)
        sr = trainer.codec_config.sample_rate
        writer.audio(step, "sample-0/wavs/gt", np.asarray(audios[0, : int(lengths[0])]), sr)
        if self.vocoder_apply is not None:
            gen_wav = self.vocoder_apply(gen_mel)
            writer.audio(
                step,
                "sample-0/wavs/gen",
                np.asarray(gen_wav[0, : int(lengths[0])]),
                sr,
            )
        import matplotlib.pyplot as plt

        plt.close(fig)
