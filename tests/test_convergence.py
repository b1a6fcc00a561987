"""Learning-signal sanity: tiny codec GAN overfits one batch (loss drops)."""

import numpy as np
import jax
import jax.numpy as jnp

from dmel_codec_tpu.models.codec import DMelCodecConfig
from dmel_codec_tpu.train.codec_trainer import CodecTrainConfig, CodecTrainer


import pytest


@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"])
def test_codec_gan_overfits_single_batch(rng, compute_dtype):
    # bf16 row: mixed precision (bf16 compute, f32 master params) must not
    # break the learning signal (VERDICT r2 #6)
    cfg = DMelCodecConfig(
        encoder_residual_channels=12,
        encoder_layers=2,
        decoder_layers=2,
        compute_dtype=compute_dtype,
    )
    trainer = CodecTrainer(
        cfg,
        CodecTrainConfig(
            learning_rate=2e-4,
            num_warmup_steps=5,
            num_training_steps=10_000,
            weight_adv=0.0,  # isolate the reconstruction objective
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), max_frames=16)
    step = trainer.jit_train_step()

    samples = 256 * 16
    t = np.arange(samples) / 24000
    wave = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    batch = {
        "audios": jnp.asarray(np.stack([wave, wave * 0.5])),
        "audio_lengths": jnp.array([samples, samples], np.int32),
    }

    losses = []
    s = state
    for i in range(60):
        s, metrics = step(s, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["train/generator/loss_mel"]))

    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)
