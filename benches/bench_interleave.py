#!/usr/bin/env python
"""Interleave/deinterleave conversion micro-benchmarks.

Python re-design of /root/reference/benches/interleave.rs: measures the
interleaved<->planar converters that back the interleaved-complex API.
Two series per group: "Native" (the C++ host runtime,
phastft_tpu/native/phastft_host.cpp) and "Numpy" (strided-slice
fallback), so the native converters' reason to exist is pinned by data.

Usage:
  python benches/bench_interleave.py [--min-log 10] [--max-log 24]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from benches import common  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-log", type=int, default=10)
    ap.add_argument("--max-log", type=int, default=24)
    args = ap.parse_args()

    from phastft_tpu import native

    have_native = native.available()
    lengths = [
        n
        for n in common.LENGTHS
        if args.min_log <= (n.bit_length() - 1) <= args.max_log
    ]

    def report(group, series, n, t, dtype):
        common.write_sample(
            group, series, n, t,
            gibps=common.throughput_complex(n, dtype, t),
        )
        print(f"{group:24s} {series:8s} n=2^{n.bit_length()-1:<3d} "
              f"{t*1e6:10.2f} us")

    for dtype, tag in ((np.float64, "f64"), (np.float32, "f32")):
        for n in lengths:
            flat = common.real_signal(2 * n, dtype)
            re, im = common.split_complex(n, dtype)

            # deinterleave: flat (re, im) pairs -> planar
            if have_native:
                t = common.median_time(lambda: native.deinterleave(flat))
                report(f"kernel_deinterleave_{tag}", "Native", n, t, dtype)
            t = common.median_time(
                lambda: (flat[0::2].copy(), flat[1::2].copy())
            )
            report(f"kernel_deinterleave_{tag}", "Numpy", n, t, dtype)

            # combine/interleave: planar -> interleaved
            if have_native:
                t = common.median_time(lambda: native.interleave(re, im))
                report(f"kernel_combine_{tag}", "Native", n, t, dtype)
            t = common.median_time(
                lambda: np.stack([re, im], axis=-1).reshape(-1)
            )
            report(f"kernel_combine_{tag}", "Numpy", n, t, dtype)


if __name__ == "__main__":
    main()
