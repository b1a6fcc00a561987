"""Codec GAN train step: convergence sanity, sharded execution, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmel_codec_tpu.models.codec import DMelCodecConfig
from dmel_codec_tpu.parallel import data_mesh, shard_batch
from dmel_codec_tpu.train.checkpoint import CheckpointManager
from dmel_codec_tpu.train.codec_trainer import (
    CodecTrainConfig,
    CodecTrainer,
    CodecTrainState,
)
from dmel_codec_tpu.train.schedule import cosine_schedule_with_warmup

SMALL = DMelCodecConfig(
    encoder_residual_channels=12,
    encoder_layers=2,
    decoder_layers=2,
)


def _batch(rng, b=2, samples=256 * 16):
    audios = rng.standard_normal((b, samples)).astype(np.float32) * 0.1
    lengths = np.array([samples, samples // 2], dtype=np.int32)[:b]
    return {"audios": jnp.asarray(audios), "audio_lengths": jnp.asarray(lengths)}


def test_schedule_matches_reference_lambda():
    import tests.reference_import  # noqa: F401
    from dmel_codec.utils.schedule import get_cosine_schedule_with_warmup_lr_lambda

    sched = cosine_schedule_with_warmup(1.0, 100, 10_000, final_lr_ratio=0.05)
    for step in [0, 1, 50, 100, 101, 5_000, 9_999, 10_000]:
        want = get_cosine_schedule_with_warmup_lr_lambda(
            step,
            num_warmup_steps=100,
            num_training_steps=10_000,
            final_lr_ratio=0.05,
        )
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-6)


def test_train_step_runs_and_updates(rng):
    trainer = CodecTrainer(SMALL, CodecTrainConfig(num_warmup_steps=2))
    state = trainer.init_state(jax.random.PRNGKey(0), max_frames=16)
    step_fn = trainer.jit_train_step()

    batch = _batch(rng)
    state1, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # warmup lr is 0 at step 0 (reference LambdaLR semantics) — params move
    # from the second update on
    state2, _ = step_fn(state1, batch, jax.random.PRNGKey(2))
    delta_g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(jnp.subtract, state2.gen_params, state.gen_params),
        0.0,
    )
    delta_d = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(jnp.subtract, state2.disc_params, state.disc_params),
        0.0,
    )
    assert delta_g > 0 and delta_d > 0

    state3, metrics3 = step_fn(state2, batch, jax.random.PRNGKey(3))
    assert int(state3.step) == 3
    assert np.isfinite(float(metrics3["train/generator/loss"]))


def test_train_step_on_8_device_mesh(rng):
    mesh = data_mesh()
    assert mesh.devices.size == 8
    trainer = CodecTrainer(SMALL, CodecTrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0), max_frames=16)
    step_fn = trainer.jit_train_step(mesh)

    samples = 256 * 8
    audios = rng.standard_normal((8, samples)).astype(np.float32) * 0.1
    batch = shard_batch(
        {
            "audios": jnp.asarray(audios),
            "audio_lengths": jnp.full((8,), samples, jnp.int32),
        },
        mesh,
    )
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["train/generator/loss"]))


def test_freeze_encoder_masks_updates(rng):
    trainer = CodecTrainer(
        SMALL, CodecTrainConfig(freeze_encoder=True, num_warmup_steps=2)
    )
    state = trainer.init_state(jax.random.PRNGKey(0), max_frames=16)
    step_fn = trainer.jit_train_step()
    state2, _ = step_fn(state, _batch(rng), jax.random.PRNGKey(1))
    state2, _ = step_fn(state2, _batch(rng), jax.random.PRNGKey(2))

    def total_delta(tree_a, tree_b):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(jnp.subtract, tree_a, tree_b),
            0.0,
        )

    assert total_delta(state2.gen_params["encoder"], state.gen_params["encoder"]) == 0
    assert total_delta(state2.gen_params["quantizer"], state.gen_params["quantizer"]) == 0
    assert total_delta(state2.gen_params["decoder"], state.gen_params["decoder"]) > 0


def test_checkpoint_roundtrip(rng, tmp_path):
    trainer = CodecTrainer(SMALL, CodecTrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0), max_frames=16)
    state2, _ = trainer.jit_train_step()(state, _batch(rng), jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.restore_latest(state) is None
    mgr.save(1, state2)
    mgr.wait()
    assert mgr.latest_step() == 1
    restored = mgr.restore_latest(state)
    np.testing.assert_array_equal(np.asarray(restored.step), np.asarray(state2.step))
    a = jax.tree_util.tree_leaves(restored.gen_params)
    b = jax.tree_util.tree_leaves(state2.gen_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mgr.close()


def test_checkpoint_best_metric_retention(tmp_path):
    """Metric-ranked top-k keeps the BEST steps, not the newest — a
    worse-then-better val_loss sequence must evict the bad middle step
    (reference ModelCheckpoint monitor=val_loss save_top_k,
    dMel_used.yaml:135-144)."""
    mgr = CheckpointManager(
        str(tmp_path / "ckpt"), max_to_keep=2, best_metric="val_loss"
    )
    state = {"w": np.zeros((2,), np.float32)}
    # good, best, terrible, mediocre — top-2 by val_loss = steps 1 and 2
    for step, loss in [(1, 0.5), (2, 0.2), (3, 9.0), (4, 1.0)]:
        mgr.save(step, {"w": np.full((2,), step, np.float32)}, metrics={"val_loss": loss})
    mgr.wait()
    kept = sorted(mgr._mgr.all_steps())
    assert kept == [1, 2], kept
    restored = mgr.restore_latest(state)
    assert float(restored["w"][0]) == 2.0
    mgr.close()

    # default (no best_metric) keeps the k newest — the resume behavior
    mgr2 = CheckpointManager(str(tmp_path / "ckpt2"), max_to_keep=2)
    for step in [1, 2, 3]:
        mgr2.save(step, {"w": np.full((2,), step, np.float32)})
    mgr2.wait()
    assert sorted(mgr2._mgr.all_steps()) == [2, 3]
    mgr2.close()
