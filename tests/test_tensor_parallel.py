"""Tensor-parallel LM training/serving on a (data, model) mesh.

Beyond-parity vs the reference (DDP only, SURVEY C27): Megatron-style TP
expressed purely as NamedSharding annotations (parallel/mesh.py). The
equivalence proof: the SAME train step on a DP-only mesh and on a
4x2 dp×tp mesh must produce matching losses, metrics and updated params —
XLA's inserted collectives change the schedule, not the math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dmel_codec_tpu.lm.inputs import TokenGridBuilder, pad_grids_to_batch
from dmel_codec_tpu.parallel.mesh import (
    MODEL_AXIS,
    data_mesh,
    dp_tp_mesh,
    lm_param_pspec,
    lm_param_shardings,
    shard_batch,
)
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer

from tests.test_lm import TINY_LM


def _batch(rng, builder, b=8):
    grids = []
    for i in range(b):
        text = rng.integers(0, 1000, size=(3 + i % 4,))
        audio = rng.integers(0, 175, size=(6, 10))
        grids.append(builder.build_train_grid(text, audio))
    return {k: jnp.asarray(v) for k, v in pad_grids_to_batch(grids, TINY_LM).items()}


def test_tp_pspec_rules():
    """Column/row rules land on the right axes and respect divisibility."""
    mesh = dp_tp_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}

    trainer = LMTrainer(TINY_LM, LMTrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0))
    shardings = lm_param_shardings(state.params, mesh)

    flat = dict(
        (jax.tree_util.keystr(p), s)
        for p, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    )
    col = flat["['slow_decoder']['layers_0']['self_attn']['q_proj']['kernel']"]
    assert col.spec == P(None, MODEL_AXIS)
    row = flat["['slow_decoder']['layers_0']['mlp']['down_proj']['kernel']"]
    assert row.spec == P(MODEL_AXIS, None)
    bias = flat["['slow_decoder']['layers_0']['self_attn']['k_proj']['bias']"]
    assert bias.spec == P(MODEL_AXIS)
    norm = flat["['slow_decoder']['layers_0']['input_layernorm']['weight']"]
    assert norm.spec == P()
    head = flat["['text_head']['kernel']"]
    assert head.spec == P(None, MODEL_AXIS)

    # divisibility fallback: a 3-wide dim can't split 2 ways -> replicate
    fake = jnp.zeros((8, 3))
    spec = lm_param_pspec(
        (
            jax.tree_util.DictKey("self_attn"),
            jax.tree_util.DictKey("q_proj"),
            jax.tree_util.DictKey("kernel"),
        ),
        fake,
        2,
    )
    assert spec == P()


def test_tp_train_step_matches_dp(rng):
    """One step on 8-device DP vs 4x2 DP×TP: identical math."""
    builder = TokenGridBuilder(config=TINY_LM)
    batch_np = _batch(rng, builder)

    trainer = LMTrainer(TINY_LM, LMTrainConfig(accumulate_grad=1, num_warmup_steps=2))
    state0 = trainer.init_state(jax.random.PRNGKey(0))

    # --- DP reference
    mesh_dp = data_mesh()
    step_dp = trainer.jit_train_step(mesh_dp)
    state_dp, metrics_dp = step_dp(state0, shard_batch(batch_np, mesh_dp))

    # --- DP x TP
    mesh_tp = dp_tp_mesh(model=2)
    state_tp0 = trainer.shard_state(state0, mesh_tp)
    # params really are distributed, not replicated
    qk = state_tp0.params["slow_decoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, MODEL_AXIS)
    step_tp = trainer.jit_train_step(mesh_tp)
    state_tp, metrics_tp = step_tp(state_tp0, shard_batch(batch_np, mesh_tp))

    for k in metrics_dp:
        np.testing.assert_allclose(
            float(metrics_dp[k]), float(metrics_tp[k]), rtol=2e-4, atol=1e-5
        ), k

    # updated params agree (gather the TP shards back)
    flat_dp = jax.tree_util.tree_leaves(jax.device_get(state_dp.params))
    flat_tp = jax.tree_util.tree_leaves(jax.device_get(state_tp.params))
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_tp_second_step_keeps_layout(rng):
    """The state returned by a TP step feeds the next step without
    re-sharding (layouts are stable across iterations)."""
    builder = TokenGridBuilder(config=TINY_LM)
    batch = _batch(rng, builder)
    trainer = LMTrainer(TINY_LM, LMTrainConfig(accumulate_grad=1))
    mesh = dp_tp_mesh(model=2)
    state = trainer.shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    step = trainer.jit_train_step(mesh)
    sb = shard_batch(batch, mesh)
    state, _ = step(state, sb)
    state, metrics = step(state, sb)
    qk = state.params["slow_decoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, MODEL_AXIS)
    assert np.isfinite(float(metrics["train/loss"]))
