"""Sequence (time-axis) parallelism for long-audio codec inference.

Beyond-parity vs the reference (SURVEY §5 "long-context: absent" — it
window-crops audio in the data pipeline instead). On TPU the codec is
fully convolutional, so XLA's SPMD partitioner can split the TIME axis
across the mesh: each chip holds a contiguous chunk of frames, dilated
convolutions exchange halos over ICI automatically, and pointwise ops
(FSQ, snake, masks) never communicate. That turns minutes-long clips
into near-linear multi-chip speedups with zero model-code changes —
the sharding is expressed purely through jit in/out shardings.

Usage:
    mesh = data_mesh()
    enc = time_sharded_encode(model, mesh)
    indices, lengths = enc(params, mels, mel_lengths)   # T sharded
    dec = time_sharded_decode(model, mesh)
    gen_mel = dec(params, indices, lengths, noise)      # L, T sharded

Outputs equal the single-device results (tests/test_sequence_parallel.py);
frame counts should divide (devices × downsample_total) to shard evenly.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dmel_codec_tpu.parallel.mesh import DATA_AXIS, replicated


def _time(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def time_sharded_encode(model, mesh: Mesh):
    """jit of DMelCodec.encode with mel frames sharded across the mesh.

    Returns fn(params, mels [B, T, M], mel_lengths [B]) ->
    (indices [B, G*R, L] sharded on L, index_lengths [B]).
    """
    from dmel_codec_tpu.models.codec import DMelCodec

    def encode(params, mels, mel_lengths):
        return model.apply(
            {"params": params}, mels, mel_lengths, method=DMelCodec.encode
        )

    repl = replicated(mesh)
    return jax.jit(
        encode,
        in_shardings=(repl, _time(mesh, 1, 3), repl),
        out_shardings=(_time(mesh, 2, 3), repl),
    )


def time_sharded_decode(model, mesh: Mesh):
    """jit of DMelCodec.decode with token frames sharded across the mesh.

    Returns fn(params, indices [B, G*R, L], feature_lengths [B],
    noise [B, T, C]) -> gen_mel [B, T, M] sharded on T.
    """
    from dmel_codec_tpu.models.codec import DMelCodec

    def decode(params, indices, feature_lengths, noise):
        return model.apply(
            {"params": params},
            indices,
            feature_lengths,
            noise,
            method=DMelCodec.decode,
        )

    repl = replicated(mesh)
    return jax.jit(
        decode,
        in_shardings=(repl, _time(mesh, 2, 3), repl, _time(mesh, 1, 3)),
        out_shardings=_time(mesh, 1, 3),
    )
