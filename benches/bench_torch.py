#!/usr/bin/env python
"""torch.fft (CPU) baseline runner — widens the comparison set toward the
reference's six libraries (/root/reference/benches/README.md:199-206).
pyFFTW is not installable in this image (no package installs), so torch's
CPU FFT (a pocketfft derivative with its own threading) is the third
host-side baseline next to numpy and scipy. Separate binary per library,
like the reference keeps FFTW/RustFFT apart (benches/README.md:43-50)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

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

    import torch

    for n in lengths:
        sig = torch.from_numpy(common.interleaved_complex(n, np.float64))
        t = common.median_time(lambda: torch.fft.fft(sig))
        common.write_sample(
            "c2c_f64_forward", "Torch", n, t, gflops=common.fft_gflops(n, t)
        )
        t = common.median_time(lambda: torch.fft.ifft(sig))
        common.write_sample("c2c_f64_inverse", "Torch", n, t)
        sig32 = torch.from_numpy(common.interleaved_complex(n, np.float32))
        t = common.median_time(lambda: torch.fft.fft(sig32))
        common.write_sample("c2c_f32_forward", "Torch", n, t)
        t = common.median_time(lambda: torch.fft.ifft(sig32))
        common.write_sample("c2c_f32_inverse", "Torch", n, t)
        x = torch.from_numpy(common.real_signal(n, np.float64))
        t = common.median_time(lambda: torch.fft.rfft(x))
        common.write_sample("r2c_f64_forward", "Torch", n, t)
        sre, sim = common.spectrum_split(n, np.float64)
        spec = torch.from_numpy(sre + 1j * sim)
        t = common.median_time(lambda: torch.fft.irfft(spec, n))
        common.write_sample("c2r_f64_inverse", "Torch", n, t)
        x32 = torch.from_numpy(common.real_signal(n, np.float32))
        t = common.median_time(lambda: torch.fft.rfft(x32))
        common.write_sample("r2c_f32_forward", "Torch", n, t)
        sre32, sim32 = common.spectrum_split(n, np.float32)
        spec32 = torch.from_numpy(
            (sre32 + 1j * sim32).astype(np.complex64)
        )
        t = common.median_time(lambda: torch.fft.irfft(spec32, n))
        common.write_sample("c2r_f32_inverse", "Torch", n, t)
        print(f"torch n=2^{n.bit_length()-1} done")


if __name__ == "__main__":
    main()
