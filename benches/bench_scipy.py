#!/usr/bin/env python
"""scipy.fft baseline runner (pocketfft C++ with plan caching) — plays the
FFTW role of the reference's comparison set
(/root/reference/benches/README.md:199-206)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import scipy.fft  # noqa: E402

from benches import common  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-log", type=int, default=6)
    ap.add_argument("--max-log", type=int, default=24)
    args = ap.parse_args()
    lengths = [
        n
        for n in common.LENGTHS
        if args.min_log <= (n.bit_length() - 1) <= args.max_log
    ]

    for n in lengths:
        sig = common.interleaved_complex(n, np.float64)
        t = common.median_time(lambda: scipy.fft.fft(sig))
        common.write_sample(
            "c2c_f64_forward", "Scipy", n, t, gflops=common.fft_gflops(n, t)
        )
        t = common.median_time(lambda: scipy.fft.ifft(sig))
        common.write_sample("c2c_f64_inverse", "Scipy", n, t)
        sig32 = common.interleaved_complex(n, np.float32)
        t = common.median_time(lambda: scipy.fft.fft(sig32))
        common.write_sample("c2c_f32_forward", "Scipy", n, t)
        t = common.median_time(lambda: scipy.fft.ifft(sig32))
        common.write_sample("c2c_f32_inverse", "Scipy", n, t)
        x = common.real_signal(n, np.float64)
        t = common.median_time(lambda: scipy.fft.rfft(x))
        common.write_sample("r2c_f64_forward", "Scipy", n, t)
        sre, sim = common.spectrum_split(n, np.float64)
        spec = sre + 1j * sim
        t = common.median_time(lambda: scipy.fft.irfft(spec, n))
        common.write_sample("c2r_f64_inverse", "Scipy", n, t)
        x32 = common.real_signal(n, np.float32)
        t = common.median_time(lambda: scipy.fft.rfft(x32))
        common.write_sample("r2c_f32_forward", "Scipy", n, t)
        sre32, sim32 = common.spectrum_split(n, np.float32)
        spec32 = (sre32 + 1j * sim32).astype(np.complex64)
        t = common.median_time(lambda: scipy.fft.irfft(spec32, n))
        common.write_sample("c2r_f32_inverse", "Scipy", n, t)
        print(f"scipy n=2^{n.bit_length()-1} done")


if __name__ == "__main__":
    main()
