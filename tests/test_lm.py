"""Slow-fast LM: golden token-grid parity, forward/loss, trainer, generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import tests.reference_import  # noqa: F401

from dmel_codec_tpu.lm.generate import InferenceConfig, SlowFastGenerator
from dmel_codec_tpu.lm.inputs import TokenGridBuilder, pad_grids_to_batch
from dmel_codec_tpu.models.lm import (
    ChatMusicLM,
    SlowFastLMConfig,
    cross_entropy_ignore,
)
from dmel_codec_tpu.models.transformer import TransformerConfig
from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer

TINY_LM = SlowFastLMConfig(
    slow=TransformerConfig(
        vocab_size=151936,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
    ),
    fast=TransformerConfig(
        vocab_size=1800,
        hidden_size=24,
        intermediate_size=48,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
    ),
    text_weight=0.01,
)


@pytest.fixture(scope="module")
def ref_processor():
    from dmel_codec.models.modules.config_lm import Qwen2Config
    from dmel_codec.models.modules.lm_process_input import ProcessInputs

    cfg = Qwen2Config.from_pretrained(
        "/root/reference/dmel_codec/config/lm/slow_lm_0.5B.json"
    )
    return ProcessInputs(
        config=cfg,
        max_length=4096,
        silence_length=3,
        audio_silence_id=[0, 0, 29, 174, 0, 6, 0, 146, 146, 6],
        text_tokenizer=None,
    )


def test_train_grid_matches_reference(rng, ref_processor):
    builder = TokenGridBuilder()
    text_ids = rng.integers(0, 151643, size=7)
    audio_ids = rng.integers(0, 175, size=(12, 10))

    want_t, want_a, want_l = ref_processor.process_2d_logits_train(
        torch.from_numpy(text_ids), torch.from_numpy(audio_ids.copy()), device="cpu"
    )
    got_t, got_a, got_l = builder.build_train_grid(text_ids, audio_ids)
    np.testing.assert_array_equal(got_t, want_t.numpy())
    np.testing.assert_array_equal(got_a, want_a.numpy())
    np.testing.assert_array_equal(got_l, want_l.numpy())


def test_infer_grid_text_prompt_matches_reference(rng, ref_processor):
    builder = TokenGridBuilder()
    text_ids = rng.integers(0, 151643, size=5)
    want = ref_processor.process_2d_logits_infer(
        device="cpu",
        text_ids=torch.from_numpy(text_ids)[None, :],
        audio_ids=None,
        text_prompt_length=len(text_ids),
        audio_prompt_length=0,
    ).numpy()  # [C+1, T]
    got_t, got_a = builder.build_infer_grid(text_ids=text_ids)
    got = np.concatenate([got_t[None, :], got_a.T], axis=0)
    np.testing.assert_array_equal(got, want)


def test_infer_grid_text_audio_prompt_layout():
    """The reference's mixed text+audio prompt path cannot run (id_shift /
    cat shape mismatch for every audio_ids orientation — known quirk), so
    this asserts the documented intended layout instead of a golden diff."""
    builder = TokenGridBuilder()
    cfg = builder.config
    rng = np.random.default_rng(0)
    text_ids = rng.integers(0, 151643, size=5)
    audio_ids = rng.integers(0, 175, size=(4, 10))
    got_t, got_a = builder.build_infer_grid(text_ids=text_ids, audio_ids=audio_ids)
    lt, la = 5, 4
    assert got_t.shape == (2 + lt + 4 + la + 1,)
    assert got_a.shape == (lt + 6 + 1 + la, 10)
    # text row: specials, text, specials, pads over the audio region
    assert got_t[0] == cfg.start_of_human_id and got_t[1] == cfg.bos_token_id
    assert (got_t[-(la + 1) :] == cfg.text_pad_id).all()
    # audio rows: pads over text region, one silence frame, shifted prompt
    assert (got_a[: lt + 6] == cfg.slow_audio_pad_id).all()
    shift = np.arange(10) * cfg.audio_codebook_size
    np.testing.assert_array_equal(
        got_a[lt + 6], np.asarray(builder.audio_silence_id) + shift
    )
    np.testing.assert_array_equal(got_a[lt + 7 :], audio_ids + shift)


def test_cross_entropy_ignore_matches_torch(rng):
    logits = rng.standard_normal((4, 6, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(4, 6))
    labels[0, :3] = -100
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 11),
        torch.from_numpy(labels).reshape(-1),
        ignore_index=-100,
    ).item()
    got = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _tiny_batch(rng, builder, b=2):
    grids = []
    for i in range(b):
        text = rng.integers(0, 1000, size=4 + i)
        audio = rng.integers(0, 175, size=(6, 10))
        grids.append(builder.build_train_grid(text, audio))
    return pad_grids_to_batch(grids, TINY_LM)


def test_lm_forward_and_train_step(rng):
    builder = TokenGridBuilder(config=TINY_LM)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng, builder).items()}

    trainer = LMTrainer(TINY_LM, LMTrainConfig(accumulate_grad=2, num_warmup_steps=2))
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer.jit_train_step()
    state1, metrics = step(state, batch)
    assert int(state1.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["train/loss"]) > 0
    # accumulation: after 1 micro-step params unchanged, after 2+2 they move
    leaves0 = jax.tree_util.tree_leaves(state.params)
    leaves1 = jax.tree_util.tree_leaves(state1.params)
    assert all(np.array_equal(a, b) for a, b in zip(leaves0, leaves1))
    s = state1
    for _ in range(3):
        s, _ = step(s, batch)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(leaves0, jax.tree_util.tree_leaves(s.params))
    )
    assert moved


def test_generation_smoke(rng):
    model = ChatMusicLM(config=TINY_LM)
    builder = TokenGridBuilder(config=TINY_LM)
    batch = _tiny_batch(rng, builder, b=1)

    # init params for both paths
    trainer = LMTrainer(TINY_LM, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(0)).params

    text_t, audio_t = builder.build_infer_grid(
        text_ids=np.array([5, 6, 7], np.int64)
    )
    gen = SlowFastGenerator(
        model, params, InferenceConfig(max_new_tokens=4, max_seq_len=64)
    )
    audio_ids, text_ids = gen.generate(text_t, audio_t, jax.random.PRNGKey(1))
    assert audio_ids.shape[1] == 10
    assert 1 <= audio_ids.shape[0] <= 4
    assert (audio_ids >= 0).all() and (audio_ids < 1800).all()
    # deshift subtracts i*codebook_size per column (a trained model samples
    # within its codebook range; random weights need not)
    raw = gen.deshift(audio_ids)
    shift = np.arange(10) * 180
    np.testing.assert_array_equal(raw + shift, audio_ids)


def test_pad_embeddings_are_zero():
    """Modality pads must embed to exact zeros (torch padding_idx parity)."""
    import jax

    from dmel_codec_tpu.train.lm_trainer import LMTrainConfig, LMTrainer

    trainer = LMTrainer(TINY_LM)
    params = trainer.init_state(jax.random.PRNGKey(0)).params
    model = ChatMusicLM(config=TINY_LM)
    cfg = TINY_LM
    text = jnp.array([[cfg.text_pad_id, 5]])
    audio = jnp.array([[[cfg.slow_audio_pad_id] * 10, list(range(10))]])
    emb = model.apply({"params": params}, text, audio, method=ChatMusicLM.embed_inputs)
    # position 0 is all-pad in both modalities -> exactly zero
    np.testing.assert_array_equal(np.asarray(emb[0, 0]), 0.0)
    assert float(jnp.abs(emb[0, 1]).sum()) > 0


def test_on_device_generation_matches_stepwise_greedy(rng):
    """With top_k=1 sampling is deterministic (argmax), so the on-device
    while_loop generation and the per-frame host loop must produce
    identical tokens — validating the fixed-shape fast decode against the
    growing-shape one and the device loop against the host loop."""
    model = ChatMusicLM(config=TINY_LM)
    trainer = LMTrainer(TINY_LM, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(3)).params
    builder = TokenGridBuilder(config=TINY_LM)
    text_t, audio_t = builder.build_infer_grid(text_ids=np.array([5, 6, 7]))

    icfg = InferenceConfig(max_new_tokens=5, max_seq_len=64, top_k=1)
    gen = SlowFastGenerator(model, params, icfg)
    a1, t1 = gen.generate(text_t, audio_t, jax.random.PRNGKey(1))
    gen2 = SlowFastGenerator(model, params, icfg)
    a2, t2 = gen2.generate_stepwise(text_t, audio_t, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)


def test_batched_generation_matches_single_greedy(rng):
    """generate_batched with B=3 copies of one prompt under top_k=1 must
    reproduce the single-sample on-device path row-for-row (and a bf16 KV
    cache must not change greedy tokens at these scales)."""
    model = ChatMusicLM(config=TINY_LM)
    trainer = LMTrainer(TINY_LM, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(3)).params
    builder = TokenGridBuilder(config=TINY_LM)
    text_t, audio_t = builder.build_infer_grid(text_ids=np.array([5, 6, 7]))

    icfg = InferenceConfig(max_new_tokens=5, max_seq_len=64, top_k=1)
    gen = SlowFastGenerator(model, params, icfg)
    a1, t1 = gen.generate(text_t, audio_t, jax.random.PRNGKey(1))

    b = 3
    batch_text = np.stack([text_t] * b)
    batch_audio = np.stack([audio_t] * b)
    audio_list, text_list = gen.generate_batched(
        batch_text, batch_audio, jax.random.PRNGKey(7)
    )
    assert len(audio_list) == b
    for arow, trow in zip(audio_list, text_list):
        np.testing.assert_array_equal(arow, a1)
        np.testing.assert_array_equal(trow, t1)

    icfg16 = InferenceConfig(
        max_new_tokens=5, max_seq_len=64, top_k=1, cache_dtype="bfloat16"
    )
    gen16 = SlowFastGenerator(model, params, icfg16)
    a3, t3 = gen16.generate(text_t, audio_t, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(a3, a1)
    np.testing.assert_array_equal(t3, t1)


def test_eval_metrics_include_reference_topk_set(rng):
    """val metrics must cover the reference accuracy set {1,2,5,10,20,50}
    (lm_lit_modules.py:305) plus losses."""
    trainer = LMTrainer(TINY_LM, LMTrainConfig(accumulate_grad=1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    builder = TokenGridBuilder(config=TINY_LM)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng, builder).items()}
    m = trainer.eval_metrics(state.params, batch)
    for k in (1, 2, 5, 10, 20, 50):
        key = f"val/audio_top{k}_acc"
        assert key in m and np.isfinite(float(m[key])) and 0 <= float(m[key]) <= 1
    # larger k can only help
    assert float(m["val/audio_top50_acc"]) >= float(m["val/audio_top1_acc"])
    for key in ("val/loss", "val/text_loss", "val/audio_loss"):
        assert np.isfinite(float(m[key]))


def test_fast_kv_cached_decode_matches_fixed(rng):
    """The KV-cached depth decode must reproduce the fixed-shape decode
    token-for-token under greedy sampling: RoPE position = cache index and
    causal prefix attention make the two mathematically identical — only
    the caching differs."""
    model = ChatMusicLM(config=TINY_LM)
    trainer = LMTrainer(TINY_LM, LMTrainConfig())
    params = trainer.init_state(jax.random.PRNGKey(3)).params
    builder = TokenGridBuilder(config=TINY_LM)
    text_t, audio_t = builder.build_infer_grid(text_ids=np.array([5, 6, 7]))

    outs = []
    for cached in (False, True):
        icfg = InferenceConfig(
            max_new_tokens=6, max_seq_len=64, top_k=1, fast_kv_cache=cached
        )
        gen = SlowFastGenerator(model, params, icfg)
        outs.append(gen.generate(text_t, audio_t, jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
