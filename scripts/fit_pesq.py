"""Fit the native PESQ calibration constants (_SP, _SL) so the
speech+white-noise response matches the published wideband PESQ curve.

Targets (approximate, from published wb-PESQ vs SNR curves for speech in
white noise): SNR 40/30/20/10/0 dB -> MOS 4.3/3.7/2.9/2.0/1.3.

    python scripts/fit_pesq.py
"""

import itertools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from dmel_codec_tpu.eval import pesq_native as P
from tests.test_pesq_native import _snr_mix, _speechish

SNRS = (40, 30, 20, 10, 0)
TARGET_MOS = (4.3, 3.7, 2.9, 2.0, 1.3)


def mos_of(raw):
    return 0.999 + 4.0 / (1.0 + np.exp(P._MAP_A * raw + P._MAP_B))


def run(sp, sl, x, degs):
    P._SP, P._SL = sp, sl
    return [mos_of(P.pesq_wb_raw(x, d)) for d in degs]


def main():
    x = _speechish(3.0)
    degs = [_snr_mix(x, s) for s in SNRS]
    best = (1e9, None)
    # sp must put speech bands well above the absolute hearing threshold
    # (real-SPL regime) or the disturbance response brick-walls at mid SNR
    for sp in (10.0 ** np.arange(1, 6)):
        for sl in (0.2, 0.5, 0.84, 1.5, 3.0, 8.0):
            mos = run(sp, sl, x, degs)
            err = float(np.sum((np.array(mos) - TARGET_MOS) ** 2))
            if err < best[0]:
                best = (err, (sp, sl), mos)
    print("coarse best:", best)
    sp0, sl0 = best[1]
    for sp in sp0 * 2.0 ** np.arange(-2, 2.5, 0.5):
        for sl in sl0 * 2.0 ** np.arange(-1.5, 1.75, 0.25):
            mos = run(sp, sl, x, degs)
            err = float(np.sum((np.array(mos) - TARGET_MOS) ** 2))
            if err < best[0]:
                best = (err, (sp, sl), mos)
    print("fine best:", best)


if __name__ == "__main__":
    main()
