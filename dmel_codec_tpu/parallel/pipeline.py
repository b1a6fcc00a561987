"""Pipeline parallelism (GPipe) for the decoder over a 'stage' mesh axis.

Beyond-parity vs the reference (DDP only, SURVEY C27). The slow decoder's
blocks are split into S contiguous stages, one per device; a batch is cut
into M microbatches that stream through the stages in lockstep SPMD:
every tick each stage runs its layers on whatever activation it holds,
then `ppermute` hands the result to the next stage over ICI. Microbatch m
leaves the last stage at tick m + S - 1 (the classic M + S - 1 schedule
with an (S-1)/M bubble). Differentiable end to end — the schedule is a
`lax.scan` and ppermute's transpose is the reverse permute, so training
gradients flow back through the pipeline.

Works on the `scan_layers=True` param layout (params['layers'] stacked
[L, ...]), which reshapes to [S, L/S, ...] with the stage axis sharded.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def stage_mesh(n_stages: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D pipeline mesh over the first n_stages devices (contiguous
    devices share the fastest ICI links, which the stage handoff rides)."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:n_stages]), (STAGE_AXIS,))


def split_stage_params(stacked_layers, n_stages: int):
    """params['layers'] stacked [L, ...] -> [S, L/S, ...] (stage-major)."""

    def reshape(leaf):
        l = leaf.shape[0]
        assert l % n_stages == 0, f"{l} layers not divisible by {n_stages} stages"
        return leaf.reshape((n_stages, l // n_stages) + leaf.shape[1:])

    return jax.tree_util.tree_map(reshape, stacked_layers)


def pipelined_decoder(decoder, mesh: Mesh, n_microbatches: int):
    """Pipelined forward of `decoder` (a models.transformer.Decoder with
    scan_layers=True) on a 'stage' mesh.

    Returns fn(params, inputs_embeds [B, S, H]) -> hidden [B, S, H],
    equal to decoder.apply on one device (tests/test_pipeline_parallel.py).
    B must divide by n_microbatches; num_layers by the stage count.
    """
    from dmel_codec_tpu.models.transformer import (
        Block,
        RMSNorm,
        rope_cos_sin,
    )

    cfg = decoder.config
    assert cfg.scan_layers, "pipeline parallelism needs the stacked param layout"
    n_stages = mesh.shape[STAGE_AXIS]
    m = n_microbatches

    def run_blocks(stage_layers, x, cos, sin, mask):
        def body(h, layer_params):
            h, _ = Block(cfg).apply(
                {"params": layer_params}, h, cos, sin, mask, None, None, True
            )
            return h, None

        x, _ = jax.lax.scan(body, x, stage_layers)
        return x

    def local_pipeline(stage_layers, mbs, cos, sin, mask):
        # stage_layers arrive [1, L/S, ...] (this stage's shard); mbs
        # [M, mb, S, H] replicated.
        stage_layers = jax.tree_util.tree_map(lambda x: x[0], stage_layers)
        sidx = jax.lax.axis_index(STAGE_AXIS)
        state = jnp.zeros_like(mbs[0])
        outs = jnp.zeros_like(mbs)
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, outs = carry
            recv = jax.lax.ppermute(state, STAGE_AXIS, fwd)
            inject = jax.lax.dynamic_index_in_dim(
                mbs, jnp.minimum(t, m - 1), 0, keepdims=False
            )
            x = jnp.where(sidx == 0, inject, recv)
            y = run_blocks(stage_layers, x, cos, sin, mask)
            idx = t - (n_stages - 1)
            valid = (sidx == n_stages - 1) & (idx >= 0)
            updated = jax.lax.dynamic_update_slice(
                outs, y[None], (jnp.clip(idx, 0, m - 1), 0, 0, 0)
            )
            outs = jnp.where(valid, updated, outs)
            return (y, outs), None

        (state, outs), _ = jax.lax.scan(
            tick, (state, outs), jnp.arange(m + n_stages - 1)
        )
        # only the last stage wrote non-zeros -> psum replicates the result
        return jax.lax.psum(outs, STAGE_AXIS)

    sharded = jax.shard_map(
        local_pipeline,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def forward(params, inputs_embeds):
        b, s, _ = inputs_embeds.shape
        assert b % m == 0, f"batch {b} not divisible by {m} microbatches"
        mb = b // m
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (mb, s))
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        mask = jnp.broadcast_to(jnp.tril(jnp.ones((s, s), bool)), (mb, s, s))
        stage_layers = split_stage_params(params["layers"], n_stages)
        mbs = inputs_embeds.reshape(m, mb, s, -1)
        outs = sharded(stage_layers, mbs, cos, sin, mask)
        hidden = outs.reshape(b, s, -1)
        return RMSNorm(cfg.rms_norm_eps).apply(
            {"params": params["norm"]}, hidden
        )

    return forward
