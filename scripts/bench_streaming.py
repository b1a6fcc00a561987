"""Bounded-HBM demonstration for chunked vocoder streaming (r2 item 4).

Vocodes a LONG clip (default 10 minutes @ 24 kHz) through the flagship
BigVGAN via `models/streaming.chunked_vocode` and reports wall time, xRT,
and the device's peak memory, next to the analytic one-shot footprint —
the number that shows WHY streaming is required: device memory is bounded
by the window (chunk + 2*halo frames), not the clip length.

    python scripts/bench_streaming.py [--minutes 10] [--chunk 480]
"""

from __future__ import annotations

import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from dmel_codec_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from dmel_codec_tpu.models.streaming import chunked_vocode


def device_peak_bytes() -> int | None:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("peak_bytes_in_use", 0)) or None
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--chunk", type=int, default=480)
    ap.add_argument("--exactness-seconds", type=float, default=8.0)
    args = ap.parse_args()

    cfg = BigVGANConfig(use_pallas_kernel=jax.devices()[0].platform == "tpu")
    voc = BigVGAN(config=cfg)
    hop = cfg.hop_total
    sr = 24000

    params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.num_mels)))[
        "params"
    ]

    # Exactness spot check on a clip short enough to also run one-shot.
    # The windowing maths is asserted on the XLA composite path: the
    # Pallas act kernel plans its time tiles from T, so window-sized and
    # full-clip graphs round differently and the *random-weight* vocoder
    # amplifies f32 tie-breaks chaotically (measured self-sensitivity of
    # the chain is ~1.6e-1 — scripts/verify_on_device.py); kernel-vs-
    # oracle numerics are gated there, chunking exactness is gated here.
    t_short = int(args.exactness_seconds * sr / hop)
    mel_s = 0.5 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (1, t_short, cfg.num_mels))
    )
    voc_x = BigVGAN(config=BigVGANConfig(use_pallas_kernel=False))
    one_shot = np.asarray(
        jax.jit(lambda p, x: voc_x.apply({"params": p}, x))(params, jnp.asarray(mel_s))
    )
    chunked_s = chunked_vocode(voc_x, params, mel_s, chunk_frames=args.chunk)
    err = float(np.abs(one_shot - chunked_s).max())
    print(f"exactness ({args.exactness_seconds:.0f}s clip, XLA path): "
          f"max |one_shot - chunked| = {err:.3e}", flush=True)
    assert err < 2e-5, "chunked vocode diverged from the one-shot oracle"
    chunked_p = chunked_vocode(voc, params, mel_s, chunk_frames=args.chunk)
    print(f"  pallas-path chunked vs XLA one-shot (info; sensitivity-"
          f"limited): {float(np.abs(one_shot - chunked_p).max()):.3e}",
          flush=True)

    # the long clip (host memory only)
    t_frames = int(args.minutes * 60 * sr / hop)
    rng = np.random.default_rng(2)
    mel = (0.5 * rng.standard_normal((1, t_frames, cfg.num_mels))).astype(np.float32)
    audio_seconds = t_frames * hop / sr

    t0 = time.perf_counter()
    wav = chunked_vocode(voc, params, mel, chunk_frames=args.chunk)
    elapsed = time.perf_counter() - t0
    assert wav.shape == (1, t_frames * hop)
    print(f"clip {audio_seconds/60:.1f} min -> wav {wav.shape} "
          f"in {elapsed:.1f} s ({audio_seconds/elapsed:.1f} xRT incl. host "
          f"staging + per-window dispatch)", flush=True)

    peak = device_peak_bytes()
    window = args.chunk + 2 * 40
    # one-shot footprint, analytic: the widest intermediate is the s5
    # activation [1, T*hop, 24] plus its up-sampled 2x anti-alias planes;
    # ~3 such f32 planes is a conservative floor.
    one_shot_floor = 3 * t_frames * hop * 24 * 4
    window_floor = 3 * window * hop * 24 * 4
    print(f"window = {window} frames -> bounded device footprint "
          f"~{window_floor/1e9:.2f} GB vs one-shot floor "
          f"~{one_shot_floor/1e9:.1f} GB for {audio_seconds/60:.0f} min "
          f"(an hour: ~{one_shot_floor * (60 / args.minutes) / 1e9:.0f} GB, "
          f">> 16 GB HBM)", flush=True)
    if peak is not None:
        print(f"device peak_bytes_in_use: {peak/1e9:.2f} GB", flush=True)
    else:
        print("device memory_stats unavailable on this runtime (tunnel)",
              flush=True)


if __name__ == "__main__":
    main()
