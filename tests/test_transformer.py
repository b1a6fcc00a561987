"""Golden parity: JAX Decoder vs HF transformers Qwen2Model (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dmel_codec_tpu.models.transformer import (
    Decoder,
    TransformerConfig,
    decoder_params_from_torch,
    init_kv_cache,
)

TINY = TransformerConfig(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config
    from transformers.models.qwen2.modeling_qwen2 import Qwen2Model

    hf_cfg = Qwen2Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    ref = Qwen2Model(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = decoder_params_from_torch(sd, TINY)
    return ref, params


def test_decoder_matches_hf_qwen2(rng, hf_pair):
    ref, params = hf_pair
    b, s = 2, 12
    embeds = rng.standard_normal((b, s, TINY.hidden_size)).astype(np.float32)

    with torch.no_grad():
        want = ref(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state.numpy()

    got, _ = Decoder(TINY).apply({"params": params}, jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_kv_cache_decode_matches_full_forward(rng, hf_pair):
    _, params = hf_pair
    b, s, max_len = 2, 10, 16
    embeds = jnp.asarray(
        rng.standard_normal((b, s, TINY.hidden_size)).astype(np.float32)
    )
    model = Decoder(TINY)

    full, _ = model.apply({"params": params}, embeds)

    # prefill s-1, then decode the last token incrementally
    cache = init_kv_cache(TINY, b, max_len)
    _, cache = model.apply({"params": params}, embeds[:, : s - 1], cache=cache)
    assert int(cache["index"]) == s - 1
    last, cache = model.apply({"params": params}, embeds[:, s - 1 :], cache=cache)
    np.testing.assert_allclose(
        np.asarray(last[:, 0]), np.asarray(full[:, -1]), atol=2e-5, rtol=1e-4
    )

    # token-by-token from scratch agrees everywhere
    cache2 = init_kv_cache(TINY, b, max_len)
    outs = []
    step = jax.jit(
        lambda e, c: model.apply({"params": params}, e, cache=c)
    )
    for t in range(s):
        out, cache2 = step(embeds[:, t : t + 1], cache2)
        outs.append(out[:, 0])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, 1)), np.asarray(full), atol=2e-5, rtol=1e-4
    )


def test_scan_layers_matches_loop_and_hf(rng, hf_pair):
    ref, loop_params = hf_pair
    scan_cfg = TransformerConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_layers=TINY.num_layers,
        num_heads=TINY.num_heads,
        num_kv_heads=TINY.num_kv_heads,
        scan_layers=True,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    scan_params = decoder_params_from_torch(sd, scan_cfg)

    b, s = 2, 12
    embeds = rng.standard_normal((b, s, TINY.hidden_size)).astype(np.float32)
    with torch.no_grad():
        want = ref(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state.numpy()
    got, _ = Decoder(scan_cfg).apply({"params": scan_params}, jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)

    # cached decode agrees too
    cache = init_kv_cache(scan_cfg, b, 16)
    _, cache = Decoder(scan_cfg).apply(
        {"params": scan_params}, jnp.asarray(embeds[:, :-1]), cache=cache
    )
    last, _ = Decoder(scan_cfg).apply(
        {"params": scan_params}, jnp.asarray(embeds[:, -1:]), cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(last[:, 0]), want[:, -1], atol=3e-5, rtol=1e-4
    )


def test_remat_matches_and_has_grads(rng, hf_pair):
    _, params = hf_pair
    remat_cfg = TransformerConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_layers=TINY.num_layers,
        num_heads=TINY.num_heads,
        num_kv_heads=TINY.num_kv_heads,
        remat=True,
    )
    embeds = jnp.asarray(
        rng.standard_normal((1, 8, TINY.hidden_size)).astype(np.float32)
    )
    base, _ = Decoder(TINY).apply({"params": params}, embeds)
    got, _ = Decoder(remat_cfg).apply({"params": params}, embeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-6)

    g = jax.grad(
        lambda p: (Decoder(remat_cfg).apply({"params": p}, embeds)[0] ** 2).sum()
    )(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
