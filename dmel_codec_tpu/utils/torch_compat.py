"""PyTorch-checkpoint interop helpers.

The reference ecosystem ships weights as torch state_dicts (BigVGAN
`{"generator": ...}`, Qwen2 safetensors, VQGAN lightning ckpts —
SURVEY section 5 "Checkpoint / resume"). These helpers convert raw
torch tensors/arrays into the layouts used by this codebase's flax
modules (channels-last convs, [in, out] dense kernels).

Everything here takes numpy arrays (call `.numpy()` / safetensors load
first) so that torch is an optional dependency of the converters only.
"""

from __future__ import annotations

import numpy as np


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight [out, in/groups, k] -> flax [k, in/groups, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def conv1d_1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv1d k=1 weight [out, in, 1] -> dense kernel [in, out]."""
    assert w.shape[-1] == 1
    return np.ascontiguousarray(w[:, :, 0].T)


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight [out, in/groups, kh, kw] -> flax [kh, kw, in/groups, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d weight [in, out, k] -> flax-style [k, in, out].

    No time flip here: `nn.conv.conv_transpose1d` flips the kernel itself
    (torch transposed conv is a true convolution; XLA cross-correlates).
    """
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1)))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> flax [in, out]."""
    return np.ascontiguousarray(w.T)


def fold_weight_norm(weight_g: np.ndarray, weight_v: np.ndarray) -> np.ndarray:
    """Materialise weight-norm: w = g * v / ||v||  (norm over all but dim 0).

    Matches torch.nn.utils.weight_norm with default dim=0 for conv/linear
    weights laid out [out, ...].
    """
    flat = weight_v.reshape(weight_v.shape[0], -1)
    norm = np.linalg.norm(flat, axis=1).reshape((-1,) + (1,) * (weight_v.ndim - 1))
    return weight_g * weight_v / norm


def cast_floats(tree, dtype):
    """Cast floating-point leaves of a pytree (params) to `dtype`.

    Inference-precision switch: the reference casts the whole codec/LM to
    bfloat16 for serving (lm_lit_modules.py:115-121, encode_unquantized's
    encode_dtype cast). Integer leaves are untouched.
    """
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
