"""Cross-framework TRAINING-step parity: N steps of the reference's torch
GAN step (tests/torch_gan_mirror.py — reference modules + exact step
ordering of codec_lit_modules.py:159-327) vs N steps of the JAX
CodecTrainer, starting from the SAME torch-initialised weights (via
models/codec_convert.py) on the SAME batches with the SAME decoder noise.

Component goldens prove forward parity; this proves the *training dynamics*
match: loss trajectories, grad norms and LR schedules stay within float32
cross-framework tolerance over multiple optimizer updates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram
from dmel_codec_tpu.models.codec import DMelCodecConfig
from dmel_codec_tpu.models.codec_convert import (
    codec_params_from_torch_state_dict,
    discriminator_params_from_torch,
)
from dmel_codec_tpu.train.codec_trainer import CodecTrainConfig, CodecTrainer

from tests.torch_gan_mirror import TorchGanStepMirror, TorchVQGANMirror

CFG = DMelCodecConfig(
    encoder_residual_channels=12, encoder_layers=2, decoder_layers=2
)
TRAIN = CodecTrainConfig(num_warmup_steps=3, num_training_steps=50)


def run_both(n_steps: int = 5, batch: int = 2, frames: int = 32, seed: int = 0):
    """Returns (torch metric rows, jax metric rows), one dict per step."""
    torch.manual_seed(seed)
    mirror = TorchVQGANMirror(CFG)
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}

    trainer = CodecTrainer(CFG, TRAIN)
    state = trainer.init_state(jax.random.PRNGKey(0), max_frames=frames)
    gen_params = jax.tree_util.tree_map(
        jnp.asarray, codec_params_from_torch_state_dict(sd, CFG)
    )
    disc_params = jax.tree_util.tree_map(
        jnp.asarray, discriminator_params_from_torch(sd)
    )
    gen_tx, disc_tx = trainer._ensure_optimizers(gen_params)
    state = state.replace(
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt_state=gen_tx.init(gen_params),
        disc_opt_state=disc_tx.init(disc_params),
    )
    step_fn = trainer.jit_train_step()

    tstep = TorchGanStepMirror(
        mirror,
        lr=TRAIN.learning_rate,
        betas=TRAIN.betas,
        eps=TRAIN.eps,
        weight_decay=TRAIN.weight_decay,
        num_warmup_steps=TRAIN.num_warmup_steps,
        num_training_steps=TRAIN.num_training_steps,
        final_lr_ratio=TRAIN.final_lr_ratio,
        weight_mel=TRAIN.weight_mel,
        weight_adv=TRAIN.weight_adv,
        weight_vq=TRAIN.weight_vq,
    )

    mel_tf = LogMelSpectrogram()
    rng = np.random.default_rng(seed)
    samples = frames * CFG.hop_length
    rows_t, rows_j = [], []
    for i in range(n_steps):
        audios = (rng.standard_normal((batch, samples)) * 0.1).astype(np.float32)
        lengths = np.array([samples, samples // 2], np.int32)[:batch]
        mels = np.asarray(mel_tf(jnp.asarray(audios)))  # [B, T, M]
        noise = rng.standard_normal(
            (batch, mels.shape[1], CFG.concat_dim)
        ).astype(np.float32)

        mt = tstep.step(
            torch.from_numpy(mels.transpose(0, 2, 1)).clone(),
            torch.from_numpy(mels.transpose(0, 2, 1)).clone(),
            torch.from_numpy(lengths // CFG.hop_length).long(),
            torch.from_numpy(noise.transpose(0, 2, 1)).clone(),
        )
        state, mj = step_fn(
            state,
            {
                "audios": jnp.asarray(audios),
                "audio_lengths": jnp.asarray(lengths),
                "noise": jnp.asarray(noise),
            },
            jax.random.PRNGKey(i),  # unused: noise injected
        )
        rows_t.append(mt)
        rows_j.append({k: float(v) for k, v in mj.items()})
    return rows_t, rows_j


KEYS = [
    "train/discriminator/loss",
    "train/discriminator/loss_real",
    "train/discriminator/loss_fake",
    "train/generator/loss",
    "train/generator/loss_mel",
    "train/generator/loss_adv",
    "train/grad_norm/generator",
    "train/grad_norm/discriminator",
]


def test_train_step_trajectories_match_torch_reference():
    rows_t, rows_j = run_both(n_steps=5)
    for i, (mt, mj) in enumerate(zip(rows_t, rows_j)):
        for k in KEYS:
            # float32 cross-framework tolerance: conv reduction order
            # differs per op and params drift a little per update; the
            # trajectories must track to ~0.5% throughout
            rel = abs(mt[k] - mj[k]) / max(abs(mt[k]), 1e-8)
            assert rel < 5e-3, (i, k, mt[k], mj[k], rel)
    # the losses must actually move (this is a GAN step, not a no-op)
    assert rows_t[0]["train/generator/loss"] != rows_t[-1]["train/generator/loss"]
