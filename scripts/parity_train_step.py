"""Cross-framework TRAINING-step parity table.

Runs N steps of the reference's torch GAN step (reference modules + the
exact step ordering of codec_lit_modules.py:159-327, via
tests/torch_gan_mirror.py) and N steps of the JAX CodecTrainer from the
same converted initial weights on the same batches/noise, and prints the
per-step loss/grad-norm comparison. The gated version of this check is
tests/test_train_parity.py (5 steps, rel < 5e-3 on every metric).

    PYTHONPATH="$PYTHONPATH:." python scripts/parity_train_step.py [--steps N]
"""

from __future__ import annotations

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # torch comparison runs on host


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from tests.test_train_parity import KEYS, run_both

    rows_t, rows_j = run_both(n_steps=args.steps)
    worst = 0.0
    print(f"{'step':>4} {'metric':34} {'torch':>12} {'jax':>12} {'rel':>10}")
    for i, (mt, mj) in enumerate(zip(rows_t, rows_j)):
        for k in KEYS:
            rel = abs(mt[k] - mj[k]) / max(abs(mt[k]), 1e-8)
            worst = max(worst, rel)
            print(f"{i:>4} {k:34} {mt[k]:12.6f} {mj[k]:12.6f} {rel:10.2e}")
    print(f"\nworst relative deviation over {args.steps} steps: {worst:.2e}")
    ok = worst < 5e-3
    print("TRAIN-STEP PARITY OK" if ok else "TRAIN-STEP PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
