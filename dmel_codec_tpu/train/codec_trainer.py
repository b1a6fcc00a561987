"""Codec GAN trainer: one pure pjit-able train step (the reference's
VQGAN.training_step re-expressed functionally).

Parity with reference models/codec_lit_modules.py:159-327, same ordering:
  1. mel extraction + quality scalar + masks (no-grad)
  2. single generator forward (encode -> FSQ -> decode)
  3. discriminator update on (real, detached fake), grad-clip 1000
  4. generator update: band-weighted mel L1 + adversarial loss against the
     *updated* discriminator (the reference steps optim_d before computing
     the generator's fake_logits, :238-267), grad-clip 1000

TPU-first: the generator forward runs once — its VJP closure is reused to
pull generator gradients back through the decoder, so a step costs one
generator fwd + one bwd (the torch original pays two forwards). Everything
(schedules included) lives inside one jitted function; under a `data` mesh
with replicated params XLA inserts the gradient all-reduce (the NCCL
equivalent, SURVEY C27).

Gradient accumulation (`accumulate_grad`, flagship value 1) is handled by
wrapping the optimizers in optax.MultiSteps when > 1.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram
from dmel_codec_tpu.models.codec import DMelCodec, DMelCodecConfig, quality_from_gt_mels
from dmel_codec_tpu.models.discriminator import MelDiscriminator
from dmel_codec_tpu.train.losses import (
    adversarial_loss,
    discriminator_loss,
    resample_mask_nearest,
    weighted_mel_loss,
)
from dmel_codec_tpu.train.schedule import cosine_schedule_with_warmup
from dmel_codec_tpu.utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class CodecTrainConfig:
    """Flagship hyperparameters (dMel_used.yaml:42-46,107-125 + pretrain.yaml)."""

    weight_adv: float = 0.2
    weight_vq: float = 1.0
    weight_mel: float = 1.0
    learning_rate: float = 1e-5
    betas: Tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-5
    weight_decay: float = 0.01
    grad_clip: float = 1000.0
    num_warmup_steps: int = 100
    num_training_steps: int = 1_000_000
    final_lr_ratio: float = 0.01  # stage/pretrain.yaml:44
    accumulate_grad: int = 1
    freeze_encoder: bool = False
    # >0 wraps both optimizers in optax.apply_if_finite: up to N consecutive
    # non-finite updates are dropped instead of poisoning the params — the
    # jit-able analogue of the reference's swallow-any-exception train step
    # (lm_lit_modules.py:361-365; the codec has no guard at all and dies)
    skip_nonfinite_updates: int = 0


class CodecTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any


def _gen_param_labels(params):
    """'freeze' for encoder+quantizer subtrees, 'train' elsewhere (ref :103-108)."""
    return {
        k: jax.tree_util.tree_map(
            lambda _, lab=("freeze" if k in ("encoder", "quantizer") else "train"): lab,
            v,
        )
        for k, v in params.items()
    }


class CodecTrainer:
    """Builds params, optimizers and the jitted train/eval steps."""

    def __init__(
        self,
        codec_config: DMelCodecConfig = DMelCodecConfig(),
        train_config: CodecTrainConfig = CodecTrainConfig(),
        mel_transform: Optional[LogMelSpectrogram] = None,
        gt_mel_transform: Optional[LogMelSpectrogram] = None,
    ):
        self.codec_config = codec_config
        self.config = train_config
        self.codec = DMelCodec(config=codec_config)
        self.discriminator = MelDiscriminator()
        # The reference wires two independently configurable transforms —
        # encode_mel_transform feeds the encoder, gt_mel_transform feeds the
        # losses/quality (codec_lit_modules.py:170-174, dMel_used.yaml:87-106).
        # The flagship config makes them identical; `gt_mel_transform=None`
        # keeps that default while preserving the degree of freedom.
        self.mel_transform = mel_transform or LogMelSpectrogram(
            sample_rate=codec_config.sample_rate,
            hop_length=codec_config.hop_length,
            n_mels=codec_config.n_mels,
        )
        self.gt_mel_transform = gt_mel_transform or self.mel_transform

        c = train_config
        self.schedule = cosine_schedule_with_warmup(
            c.learning_rate,
            c.num_warmup_steps,
            c.num_training_steps,
            final_lr_ratio=c.final_lr_ratio,
        )
        self._adamw = lambda: optax.adamw(
            self.schedule,
            b1=c.betas[0],
            b2=c.betas[1],
            eps=c.eps,
            weight_decay=c.weight_decay,
        )

    def _wrap_accum(self, tx: optax.GradientTransformation):
        if self.config.accumulate_grad > 1:
            return optax.MultiSteps(tx, self.config.accumulate_grad)
        return tx

    def _ensure_optimizers(self, gen_params):
        """Build (once) and cache the optimizers; train_step works on
        externally constructed states too."""
        if not hasattr(self, "_gen_tx"):
            self._gen_tx, self._disc_tx = self.make_optimizers(gen_params)
        return self._gen_tx, self._disc_tx

    def make_optimizers(self, gen_params):
        c = self.config
        gen_tx = optax.chain(optax.clip_by_global_norm(c.grad_clip), self._adamw())
        if c.freeze_encoder:
            gen_tx = optax.multi_transform(
                {"train": gen_tx, "freeze": optax.set_to_zero()},
                _gen_param_labels(gen_params),
            )
        disc_tx = optax.chain(optax.clip_by_global_norm(c.grad_clip), self._adamw())
        gen_tx, disc_tx = self._wrap_accum(gen_tx), self._wrap_accum(disc_tx)
        if c.skip_nonfinite_updates > 0:
            gen_tx = optax.apply_if_finite(gen_tx, c.skip_nonfinite_updates)
            disc_tx = optax.apply_if_finite(disc_tx, c.skip_nonfinite_updates)
        return gen_tx, disc_tx

    def init_state(self, rng: jax.Array, max_frames: int = 128) -> CodecTrainState:
        cfg = self.codec_config
        k1, k2 = jax.random.split(rng)
        mels = jnp.zeros((1, max_frames, cfg.n_mels))
        masks = jnp.ones((1, max_frames, 1))
        gen_params = self.codec.init(
            k1, mels, masks, jnp.zeros((1, 1)), jnp.zeros((1, max_frames, cfg.concat_dim))
        )["params"]
        disc_params = self.discriminator.init(k2, mels)["params"]
        gen_tx, disc_tx = self._ensure_optimizers(gen_params)
        return CodecTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_tx.init(gen_params),
            disc_opt_state=disc_tx.init(disc_params),
        )

    # ------------------------------------------------------------------
    def _prepare(self, audios: jnp.ndarray, audio_lengths: jnp.ndarray):
        """Mel extraction, masks and quality — the no-grad preamble (:170-179).
        Encoder input comes from `mel_transform`; gt mels, the quality
        scalar and mask lengths from `gt_mel_transform` (ref :170-179 uses
        gt_mel_transform for all three)."""
        encode_mels = self.mel_transform(audios)
        if self.gt_mel_transform is self.mel_transform:
            gt_raw = encode_mels
        else:
            gt_raw = self.gt_mel_transform(audios)
        quality = quality_from_gt_mels(gt_raw)
        mel_lengths = audio_lengths // self.gt_mel_transform.hop_length
        mel_masks = sequence_mask(mel_lengths, gt_raw.shape[1])[..., None].astype(
            gt_raw.dtype
        )
        gt_mels = gt_raw * mel_masks
        return encode_mels, gt_mels, mel_masks, quality

    def train_step(
        self, state: CodecTrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[CodecTrainState, Dict[str, jnp.ndarray]]:
        """batch: {'audios': [B, L] float, 'audio_lengths': [B] int}.

        An optional batch['noise'] [B, T, concat_dim] overrides the decoder's
        Gaussian draw — used by the cross-framework training-step parity
        harness (scripts/parity_train_step.py) to drive this step and the
        reference's torch step with identical randomness."""
        cfg = self.config
        self._ensure_optimizers(state.gen_params)
        audios = batch["audios"].astype(jnp.float32)
        encode_mels, gt_mels, mel_masks, quality = self._prepare(
            audios, batch["audio_lengths"]
        )
        quality = jax.lax.stop_gradient(quality)
        noise = batch.get("noise")
        if noise is None:
            noise = jax.random.normal(
                rng, encode_mels.shape[:2] + (self.codec_config.concat_dim,)
            )
        else:
            noise = noise.astype(jnp.float32)

        # --- single generator forward with reusable VJP -------------------
        def gen_forward(gen_params):
            gen_mel, _ = self.codec.apply(
                {"params": gen_params}, encode_mels, mel_masks, quality, noise
            )
            return gen_mel

        gen_mel, gen_vjp = jax.vjp(gen_forward, state.gen_params)
        gen_mel_sg = jax.lax.stop_gradient(gen_mel)

        # --- discriminator update (ref :214-244) --------------------------
        def d_loss_fn(disc_params):
            real = self.discriminator.apply({"params": disc_params}, gt_mels)
            fake = self.discriminator.apply({"params": disc_params}, gen_mel_sg)
            d_mask = resample_mask_nearest(mel_masks, real.shape[2])
            total, loss_real, loss_fake = discriminator_loss(real, fake, d_mask)
            # no accumulate_grad scaling here: optax.MultiSteps averages the
            # accumulated gradients (the reference divides because torch
            # grad accumulation SUMS, codec_lit_modules.py:223)
            return total, (loss_real, loss_fake, d_mask)

        (loss_d, (loss_real, loss_fake, d_mask)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_params)
        d_updates, disc_opt_state = self._disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- generator losses against the UPDATED critic (ref :266-267) ---
        def g_loss_from_mel(gm):
            loss_mel = weighted_mel_loss(gm, gt_mels, mel_masks)
            fake = self.discriminator.apply({"params": disc_params}, gm)
            loss_adv = adversarial_loss(fake, d_mask)
            total = cfg.weight_mel * loss_mel + cfg.weight_adv * loss_adv
            return total, (loss_mel, loss_adv)

        (loss_g, (loss_mel, loss_adv)), dgen_mel = jax.value_and_grad(
            g_loss_from_mel, has_aux=True
        )(gen_mel)
        (g_grads,) = gen_vjp(dgen_mel)
        g_updates, gen_opt_state = self._gen_tx.update(
            g_grads, state.gen_opt_state, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics = {
            # the reference configures a grad_norm_monitor with no
            # implementing class (dMel_used.yaml:146-151) — provided here
            "train/grad_norm/generator": optax.global_norm(g_grads),
            "train/grad_norm/discriminator": optax.global_norm(d_grads),
            "train/discriminator/loss": loss_d,
            "train/discriminator/loss_real": loss_real,
            "train/discriminator/loss_fake": loss_fake,
            "train/generator/loss": loss_g,
            "train/generator/loss_mel": loss_mel,
            "train/generator/loss_adv": loss_adv,
            # the inner schedule advances once per accumulated update
            "train/lr": self.schedule(state.step // max(1, cfg.accumulate_grad)),
        }
        new_state = CodecTrainState(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
        )
        return new_state, metrics

    def eval_step(
        self, state: CodecTrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Dict[str, jnp.ndarray]:
        """Masked L1 mel loss with fixed quality 2.0 (ref validation_step :330-391)."""
        audios = batch["audios"].astype(jnp.float32)
        encode_mels, gt_mels, mel_masks, _ = self._prepare(
            audios, batch["audio_lengths"]
        )
        quality = jnp.full((audios.shape[0], 1), 2.0)
        noise = jax.random.normal(
            rng, encode_mels.shape[:2] + (self.codec_config.concat_dim,)
        )
        gen_mel, _ = self.codec.apply(
            {"params": state.gen_params}, encode_mels, mel_masks, quality, noise
        )
        from dmel_codec_tpu.utils.masks import avg_with_mask

        return {"val_loss": avg_with_mask(jnp.abs(gen_mel - gt_mels), mel_masks)}

    # ------------------------------------------------------------------
    def jit_train_step(self, mesh=None) -> Callable:
        """Jit (optionally with explicit data-mesh shardings) the train step."""
        if mesh is None:
            return jax.jit(self.train_step)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            self.train_step,
            in_shardings=(repl, {"audios": data, "audio_lengths": data}, repl),
            out_shardings=(repl, repl),
        )
