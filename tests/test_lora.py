"""LoRA finetuning: zero-start identity, adapter-only training, merge.

The reference only declares LoRA-only checkpoint filtering
(lm_lit_modules.py:371-381); these tests cover the real implementation
(train/lora.py + LMTrainer.init_lora_state/lora_train_step).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dmel_codec_tpu.lm.inputs import TokenGridBuilder, pad_grids_to_batch
from dmel_codec_tpu.models.lm import ChatMusicLM, SlowFastLMConfig
from dmel_codec_tpu.models.transformer import TransformerConfig
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer
from dmel_codec_tpu.train.lora import (
    LoRAConfig,
    init_lora,
    lora_param_count,
    merge_lora,
)

TINY = SlowFastLMConfig(
    slow=TransformerConfig(151936, 32, 64, 2, 4, 2),
    fast=TransformerConfig(1800, 24, 48, 2, 4, 2),
    text_weight=0.01,
)


def _trainer():
    # warmup=1 so the LR is nonzero from the first update (the flagship
    # 1000-step warmup would leave step-0 updates at lr=0)
    return LMTrainer(
        TINY,
        LMTrainConfig(accumulate_grad=1, num_warmup_steps=0, learning_rate=1e-2),
    )


def _batch(rng, trainer, n=2):
    builder = TokenGridBuilder(config=TINY)
    grids = [
        builder.build_train_grid(
            rng.integers(0, 1000, size=4), rng.integers(0, 175, size=(6, 10))
        )
        for _ in range(n)
    ]
    return {k: jnp.asarray(v) for k, v in pad_grids_to_batch(grids, TINY).items()}


def test_lora_starts_at_base(rng):
    """b=0 init => merged params bit-identical to base."""
    trainer = _trainer()
    state = trainer.init_lora_state(jax.random.PRNGKey(0))
    merged = trainer.merged_lora_params(state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.base_params),
        jax.tree_util.tree_leaves(merged),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_targets_and_size(rng):
    trainer = _trainer()
    state = trainer.init_lora_state(jax.random.PRNGKey(0))
    names = sorted(state.lora)
    # q/k/v/o on every layer of both decoders: 2 decoders x 2 layers x 4
    assert len(names) == 16
    assert all("self_attn" in n for n in names)
    base_count = sum(x.size for x in jax.tree_util.tree_leaves(state.base_params))
    assert lora_param_count(state.lora) < 0.05 * base_count


def test_lora_train_step_updates_adapters_only(rng):
    trainer = _trainer()
    state = trainer.init_lora_state(jax.random.PRNGKey(0))
    batch = _batch(rng, trainer)
    step = jax.jit(trainer.lora_train_step)
    state2, metrics = step(state, batch)
    assert bool(jnp.isfinite(metrics["train/loss"]))
    assert float(metrics["train/grad_norm"]) > 0.0
    # base untouched (it's carried through, not updated)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.base_params),
        jax.tree_util.tree_leaves(state2.base_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adapters moved ('a' side gets gradient once b is nonzero after the
    # first update; 'b' side moves immediately)
    moved = any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree_util.tree_leaves(state.lora),
            jax.tree_util.tree_leaves(state2.lora),
        )
    )
    assert moved


def test_lora_overfit_reduces_loss(rng):
    trainer = _trainer()
    state = trainer.init_lora_state(jax.random.PRNGKey(0))
    batch = _batch(rng, trainer)
    step = jax.jit(trainer.lora_train_step)
    first = None
    for _ in range(12):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["train/loss"])
    assert float(metrics["train/loss"]) < first


def test_lora_fit_loop_and_checkpoint(tmp_path, rng):
    """LMFitLoop drives the adapter-only step and orbax round-trips the
    LoRA state (base+adapters; the `lora` subtree alone is the reference's
    LoRA-only checkpoint)."""
    from dmel_codec_tpu.train.checkpoint import CheckpointManager
    from dmel_codec_tpu.train.lm_loop import LMFitLoop
    from dmel_codec_tpu.train.loop import FitConfig

    trainer = _trainer()
    state = trainer.init_lora_state(jax.random.PRNGKey(0))
    batch = _batch(rng, trainer)

    fit = FitConfig(
        max_steps=2,
        val_interval=100,
        log_every=1,
        ckpt_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        use_mesh=False,
    )
    out = LMFitLoop(trainer, lambda epoch: [batch, batch], None, fit).run(state)
    assert int(out.step) == 2

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    assert ckpt.latest_step() == 2
    template = trainer.init_lora_state(jax.random.PRNGKey(0))
    restored = ckpt.restore_latest(template)
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(out.lora),
        jax.tree_util.tree_leaves(restored.lora),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_only_changes_targets(rng):
    trainer = _trainer()
    base = trainer.init_state(jax.random.PRNGKey(0)).params
    cfg = LoRAConfig(rank=4, alpha=8.0)
    lora = init_lora(jax.random.PRNGKey(1), base, cfg)
    # force nonzero b so merge actually changes the targets
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)
    merged = merge_lora(base, lora, cfg)
    flat_b = jax.tree_util.tree_flatten_with_path(base)[0]
    flat_m = jax.tree_util.tree_flatten_with_path(merged)[0]
    for (path, vb), (_, vm) in zip(flat_b, flat_m):
        name = "/".join(k.key for k in path)
        if name in lora:
            assert not np.array_equal(np.asarray(vb), np.asarray(vm)), name
        else:
            np.testing.assert_array_equal(np.asarray(vb), np.asarray(vm))
