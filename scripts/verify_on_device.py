"""On-device numerical gate for every Pallas serving dispatch path.

The 197-case test suite runs interpret-mode on CPU (tests/conftest.py pins
jax_platforms=cpu), which cannot see MXU precision effects, Mosaic layout
bugs, or DMA races. This script runs EVERY Pallas dispatch path on the
real chip — anti-alias both layouts (merged small-C / native wide-C,
segmented, ragged tail), stage fusion v1 + v2 at each tail C, v2
streaming-weights at C in {192, 384}, and the full `bigvgan_apply_fused`
serving forward vs the module oracle — in f32 AND bf16, and EXITS NONZERO
on any tolerance breach. Run it before recording any bench number
(BENCHMARKS.md carries the provenance line).

    python scripts/verify_on_device.py            # full gate
    python scripts/verify_on_device.py --quick    # skips the full-vocoder case

Tolerances: f32 paths bound the polynomial-sin deviation (abs err < 4e-6
per activation) chained through the op; bf16 paths bound the bf16 FIR-tap
rounding + bf16 inter-op storage relative to the f32 oracle's scale (the
unfused production path stores bf16 between ops too, so this is the
serving-accuracy contract, not an implementation artifact).
"""

from __future__ import annotations

import argparse
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

FAILURES: list[str] = []


def check(name: str, got, ref, tol: float, scale: float | None = None) -> None:
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    if scale is None:
        scale = float(np.abs(ref).max()) or 1.0
    err = float(np.abs(got - ref).max())
    rel = err / scale
    ok = rel < tol
    status = "ok  " if ok else "FAIL"
    print(f"  [{status}] {name:58s} maxerr {err:9.3e}  rel {rel:9.3e}  tol {tol:.0e}",
          flush=True)
    if not ok:
        FAILURES.append(name)


def verify_anti_alias() -> None:
    from dmel_codec_tpu.ops.anti_alias import (
        _plan_segments,
        anti_alias_activation_reference,
        fused_anti_alias_activation,
    )

    print("anti-alias activation kernel (ops/anti_alias.py)", flush=True)
    rng = jax.random.PRNGKey(0)
    # (name, B, T, C) — merged small-C lanes, native wide-C, ragged tails
    cases = [
        ("merged s5-like   [16, 12000, 24]", 16, 12000, 24),
        ("merged s3-like   [16,  6000, 96]", 16, 6000, 96),
        ("native s1-like   [16,  6000, 384]", 16, 6000, 384),
        ("native s0-like   [16,  1500, 768]", 16, 1500, 768),
        ("ragged tail      [4,   1003, 48]", 4, 1003, 48),
    ]
    # a segmented-path case: merged lane width big enough to split
    b, t, c = 64, 48000, 24
    if _plan_segments(b, t, -(-(b * c) // 128) * 128, 2) > 1:
        cases.append(("segmented merged [64, 48000, 24]", b, t, c))
    for name, b, t, c in cases:
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, hash(name) % 97), 3)
        x = jax.random.normal(k1, (b, t, c), jnp.float32)
        alpha = 0.3 * jax.random.normal(k2, (c,))
        beta = 0.3 * jax.random.normal(k3, (c,))
        ref = anti_alias_activation_reference(x, alpha, beta, logscale=True)
        got32 = fused_anti_alias_activation(x, alpha, beta, True)
        check(f"f32  {name}", got32, ref, 2e-4)
        got16 = fused_anti_alias_activation(
            x.astype(jnp.bfloat16), alpha, beta, True
        )
        check(f"bf16 {name}", got16, ref, 3e-2)


def verify_stage_fused() -> None:
    from dmel_codec_tpu.models.bigvgan import AMPBlock1
    from dmel_codec_tpu.ops.stage_fused import (
        StageSpec,
        fused_amp_stage,
        fused_amp_stage_v2,
        pack_stage,
        stage_reference,
    )

    print("whole-stage fused resblock kernels (ops/stage_fused.py)", flush=True)

    def make(c: int, seed: int):
        spec = StageSpec(channels=c)
        prm = []
        x0 = jnp.zeros((1, 64, c))
        r = jax.random.PRNGKey(seed)
        for i, (k, dils) in enumerate(zip(spec.kernel_sizes, spec.dilations)):
            blk = AMPBlock1(channels=c, kernel_size=k, dilation=tuple(dils),
                            activation=spec.activation, logscale=spec.logscale)
            prm.append(blk.init(jax.random.fold_in(r, i), x0)["params"])
        return spec, pack_stage(prm, spec)

    # (impl-name, fn, C, T) — resident v1/v2 tail Cs + v2 streaming classes
    cases = [
        ("v1", fused_amp_stage, 24, 12000),
        ("v1", fused_amp_stage, 96, 6000),
        ("v2", fused_amp_stage_v2, 24, 12000),
        ("v2", fused_amp_stage_v2, 48, 12000),
        ("v2", fused_amp_stage_v2, 96, 6000),
        ("v2-stream", fused_amp_stage_v2, 192, 6000),
        ("v2-stream", fused_amp_stage_v2, 384, 3000),
    ]
    for impl, fn, c, t in cases:
        spec, packed = make(c, seed=c)
        x = jax.random.normal(jax.random.PRNGKey(c + 1), (4, t, c), jnp.float32)
        ref = stage_reference(x, packed, spec)
        got32 = fn(x, packed, spec)
        name = f"{impl:9s} [4, {t}, {c}]"
        check(f"f32  {name}", got32, ref, 2e-4)
        got16 = fn(x.astype(jnp.bfloat16), packed, spec)
        check(f"bf16 {name}", got16, ref, 6e-2)
        # edge rows (replicate / zero-pad semantics) checked separately: an
        # edge-handling bug can hide inside a full-tensor max over 4*t*c
        check(f"f32  {name} head", np.asarray(got32)[:, :32],
              np.asarray(ref)[:, :32], 2e-4, scale=float(np.abs(ref).max()))
        check(f"f32  {name} tail", np.asarray(got32)[:, -32:],
              np.asarray(ref)[:, -32:], 2e-4, scale=float(np.abs(ref).max()))


def verify_full_vocoder() -> None:
    from dmel_codec_tpu.models.bigvgan import (
        BigVGAN,
        BigVGANConfig,
        bigvgan_apply_fused,
    )

    print("full serving forward (bigvgan_apply_fused vs module)", flush=True)
    cfg = BigVGANConfig(use_pallas_kernel=False)  # oracle: pure-XLA module
    model = BigVGAN(config=cfg)
    mel = 0.5 * jax.random.normal(jax.random.PRNGKey(11), (2, 188, cfg.num_mels))
    params = model.init(jax.random.PRNGKey(12), mel[:1, :8])["params"]
    fwd = jax.jit(lambda p, m: model.apply({"params": p}, m))
    ref = np.asarray(fwd(params, mel))

    # The random-init flagship vocoder is a CHAOTIC map: ~120 unit-gain
    # weight-norm convs + snake nonlinearities amplify an input
    # perturbation ~1e5x (measured: +1e-6 input noise moves the pure-XLA
    # oracle's own output by maxerr 0.155 / mean 6.1e-3 at this shape).
    # Fixed e2e tolerances are therefore meaningless; the per-op checks
    # above carry the tight bounds, and the e2e check below calibrates
    # against the oracle's OWN sensitivity at each precision's per-op
    # deviation scale (poly-sin ~4e-6 for f32; rounding ~2e-3 for bf16).
    # A wiring bug (wrong stage params, misordered taps, bad upsample)
    # produces errors far beyond self-sensitivity; chain-amplified
    # rounding does not.
    def sens(eps: float):
        noise = eps * jax.random.normal(jax.random.PRNGKey(13), mel.shape)
        pert = np.asarray(fwd(params, mel + noise))
        d = np.abs(pert - ref)
        return float(d.max()), float(d.mean())

    smax32, smean32 = sens(4e-6)
    print(f"  oracle self-sensitivity (f32 poly scale): max {smax32:.3e} "
          f"mean {smean32:.3e}", flush=True)

    def check_e2e(name: str, got, smax: float, smean: float) -> None:
        got = np.asarray(got, np.float32)
        d = np.abs(got - ref)
        ok = (
            np.isfinite(got).all()
            and d.max() < 3 * smax + 1e-4
            and d.mean() < 3 * smean + 1e-6
            # gross-artifact catch: energy must match the oracle's
            and 0.5 < float(np.sqrt((got**2).mean() / (ref**2).mean())) < 2.0
        )
        status = "ok  " if ok else "FAIL"
        print(f"  [{status}] {name:58s} maxerr {d.max():9.3e} "
              f"(sens-bound {3 * smax:.3e})  mean {d.mean():9.3e} "
              f"(bound {3 * smean:.3e})", flush=True)
        if not ok:
            FAILURES.append(name)

    kcfg = BigVGANConfig(use_pallas_kernel=True)
    for fuse_max in (96, 192, 384):
        got = bigvgan_apply_fused(params, mel, kcfg, fuse_max_channels=fuse_max)
        check_e2e(f"f32  vocoder e2e fuse<={fuse_max} [2,188,100]",
                  got, smax32, smean32)
    from dmel_codec_tpu.utils.torch_compat import cast_floats

    p16 = cast_floats(params, jnp.bfloat16)
    # bf16 yardstick: input-noise calibration under-counts (bf16 rounds at
    # EVERY op, not once at the input), so the oracle for bf16 serving
    # deviation is the pure-XLA module itself run on the same bf16 params
    # and input. The fused path must not deviate from f32 materially more
    # than XLA's own bf16 forward does.
    ref16 = np.asarray(fwd(p16, mel.astype(jnp.bfloat16)), np.float32)
    d16 = np.abs(ref16 - ref)
    print(f"  XLA-module bf16 deviation from f32: max {d16.max():.3e} "
          f"mean {d16.mean():.3e}", flush=True)
    got16 = bigvgan_apply_fused(
        p16, mel.astype(jnp.bfloat16), kcfg, fuse_max_channels=384
    )
    check_e2e("bf16 vocoder e2e fuse<=384 [2,188,100]", got16,
              float(d16.max()), float(d16.mean()))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    plat = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]} (platform {plat})", flush=True)
    if plat not in ("tpu",):
        print("WARNING: not a TPU — this gate is meant for the real chip",
              flush=True)
    verify_anti_alias()
    verify_stage_fused()
    if not args.quick:
        verify_full_vocoder()
    if FAILURES:
        print(f"\nGATE FAILED: {len(FAILURES)} breach(es):")
        for f in FAILURES:
            print(f"  - {f}")
        return 1
    print("\nGATE PASSED: all on-device Pallas paths within tolerance")
    return 0


if __name__ == "__main__":
    sys.exit(main())
