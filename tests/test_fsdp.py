"""FSDP (ZeRO-3) LM training on the data axis, optionally composed with TP.

Beyond-parity vs the reference (DDP only, SURVEY C27). Annotation-only:
params + Adam moments sharded over 'data' (parallel/mesh._with_fsdp), XLA
emits the all-gather-on-use / reduce-scatter-on-grad schedule. Proofs:
 - same math as replicated DP (losses, metrics, updated params match),
 - per-device param bytes really drop ~N_data-fold,
 - composes with TP on a (data, model) mesh,
 - layouts are stable across steps (no re-shard churn).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dmel_codec_tpu.lm.inputs import TokenGridBuilder, pad_grids_to_batch
from dmel_codec_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_mesh,
    dp_tp_mesh,
    lm_param_shardings,
    shard_batch,
)
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer

from tests.test_lm import TINY_LM
from tests.test_tensor_parallel import _batch


def _param_bytes_on(device, params):
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        for shard in leaf.addressable_shards:
            if shard.device == device:
                total += shard.data.nbytes
    return total


def test_fsdp_specs_shard_largest_free_axis():
    mesh = data_mesh()
    trainer = LMTrainer(TINY_LM, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(0)).params
    shardings = lm_param_shardings(params, mesh, fsdp=True)
    flat = dict(
        (jax.tree_util.keystr(p), s)
        for p, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    )
    # embedding table [V, H]: vocab (the big axis) takes the data shard
    emb = flat["['text_embed']['embedding']"]
    assert emb.spec == P(DATA_AXIS, None)
    # square-ish kernel: some axis is sharded
    qk = flat["['slow_decoder']['layers_0']['self_attn']['q_proj']['kernel']"]
    assert DATA_AXIS in tuple(qk.spec)
    # 1-D norm weights stay replicated
    norm = flat["['slow_decoder']['layers_0']['input_layernorm']['weight']"]
    assert norm.spec == P()


def test_fsdp_composes_with_tp():
    mesh = dp_tp_mesh(model=2)
    trainer = LMTrainer(TINY_LM, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(0)).params
    shardings = lm_param_shardings(params, mesh, fsdp=True)
    flat = dict(
        (jax.tree_util.keystr(p), s)
        for p, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    )
    qk = flat["['slow_decoder']['layers_0']['self_attn']['q_proj']['kernel']"]
    # TP keeps the Megatron column shard, FSDP takes the other axis
    assert qk.spec == P(DATA_AXIS, MODEL_AXIS)
    down = flat["['slow_decoder']['layers_0']['mlp']['down_proj']['kernel']"]
    assert down.spec == P(MODEL_AXIS, DATA_AXIS)


def test_fsdp_train_step_matches_dp(rng):
    builder = TokenGridBuilder(config=TINY_LM)
    batch = _batch(rng, builder)
    trainer = LMTrainer(TINY_LM, LMTrainConfig(accumulate_grad=1, num_warmup_steps=2))
    state0 = trainer.init_state(jax.random.PRNGKey(0))

    mesh = data_mesh()
    # replicated-DP reference
    step_dp = trainer.jit_train_step(mesh)
    state_dp, metrics_dp = step_dp(state0, shard_batch(batch, mesh))

    # FSDP
    state_f0 = trainer.shard_state(state0, mesh, fsdp=True)
    emb = state_f0.params["text_embed"]["embedding"]
    assert emb.sharding.spec == P(DATA_AXIS, None)
    # per-device bytes really shrink ~8x (allow slack for replicated norms)
    dev0 = mesh.devices.flat[0]
    repl_bytes = _param_bytes_on(dev0, state0.params)
    fsdp_bytes = _param_bytes_on(dev0, state_f0.params)
    assert fsdp_bytes < repl_bytes / 4

    step_f = trainer.jit_train_step(mesh, fsdp=True)
    state_f, metrics_f = step_f(state_f0, shard_batch(batch, mesh))

    for k in metrics_dp:
        np.testing.assert_allclose(
            float(metrics_dp[k]), float(metrics_f[k]), rtol=2e-4, atol=1e-5
        ), k
    flat_dp = jax.tree_util.tree_leaves(jax.device_get(state_dp.params))
    flat_f = jax.tree_util.tree_leaves(jax.device_get(state_f.params))
    for a, b in zip(flat_dp, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_fsdp_tp_train_step_matches_dp(rng):
    builder = TokenGridBuilder(config=TINY_LM)
    batch = _batch(rng, builder)
    trainer = LMTrainer(TINY_LM, LMTrainConfig(accumulate_grad=1, num_warmup_steps=2))
    state0 = trainer.init_state(jax.random.PRNGKey(0))

    mesh_dp = data_mesh()
    state_dp, metrics_dp = trainer.jit_train_step(mesh_dp)(
        state0, shard_batch(batch, mesh_dp)
    )

    mesh = dp_tp_mesh(model=2)
    state_x0 = trainer.shard_state(state0, mesh, fsdp=True)
    step = trainer.jit_train_step(mesh, fsdp=True)
    state_x, metrics_x = step(state_x0, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(metrics_dp["train/loss"]), float(metrics_x["train/loss"]),
        rtol=2e-4, atol=1e-5,
    )
    # second step keeps the composed layout
    state_x, metrics_x2 = step(state_x, shard_batch(batch, mesh))
    qk = state_x.params["slow_decoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(DATA_AXIS, MODEL_AXIS)
    assert np.isfinite(float(metrics_x2["train/loss"]))
