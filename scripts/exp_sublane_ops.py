"""Probe: Mosaic support + cost of sublane-axis ops needed by stage_fused v2.

The v2 fused-stage layout puts time on SUBLANES (channels on lanes), so
time shifts become row reads. Three mechanisms are probed on-device:
  a) static misaligned sublane slice  x[3:3+112, :]
  b) pltpu.roll(axis=0) full-plane sublane rotate
  c) full-plane right-matmul [T, C] @ [C, C] (conv tap form)

    python scripts/exp_sublane_ops.py
"""

from __future__ import annotations

from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_codec_tpu.utils.profiling import timed_rep


def k_slice(x_ref, o_ref):
    # static misaligned sublane slices: odd offsets 1..7
    acc = x_ref[0:112, :].astype(jnp.float32)
    for off in (1, 3, 5, 7, 9):
        acc = acc + x_ref[off : off + 112, :].astype(jnp.float32)
    o_ref[...] = acc


def k_roll(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    acc = x
    for off in (1, 3, 5, 7, 9):
        acc = acc + pltpu.roll(x, shift=off, axis=0)
    o_ref[...] = acc[:112, :]


def k_matmul(x_ref, w_ref, o_ref, *, taps: int):
    x = x_ref[...]
    w = w_ref[...]
    y = None
    for i in range(taps):
        term = jnp.dot(
            x[8 * i : 8 * i + 1024, :], w, preferred_element_type=jnp.float32
        )
        y = term if y is None else y + term
    o_ref[...] = y


def main() -> None:
    rows, lanes = 1280, 96
    x = jnp.asarray(np.random.default_rng(0).standard_normal((rows, lanes)), jnp.float32)

    for name, kern, out_rows in (("slice", k_slice, 112), ("roll", k_roll, 112)):
        try:
            y = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((out_rows, lanes), jnp.float32),
            )(x)
            ref = sum(
                np.asarray(x)[off : off + 112] for off in (0, 1, 3, 5, 7, 9)
            )
            err = float(jnp.max(jnp.abs(y - ref)))
            print(f"{name}: OK err {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)

    # timing: 126-tap conv-shaped work on [1152+, 96] plane
    xb = jnp.asarray(
        np.random.default_rng(1).standard_normal((2048 + 128, 96)), jnp.bfloat16
    )
    w = jnp.asarray(np.random.default_rng(2).standard_normal((96, 96)), jnp.bfloat16)
    f = pl.pallas_call(
        partial(k_matmul, taps=11),
        out_shape=jax.ShapeDtypeStruct((1024, 96), jnp.float32),
    )
    dt = timed_rep(lambda z: jnp.mean(f(z, w)), xb, iters=50)
    flops = 11 * 2 * 1024 * 96 * 96
    print(f"matmul 11-tap [1024,96]@[96,96]: {dt*1e6:.1f} us "
          f"({flops/dt/1e12:.1f} TFLOP/s logical)", flush=True)


if __name__ == "__main__":
    main()
