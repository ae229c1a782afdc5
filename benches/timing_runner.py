#!/usr/bin/env python
"""Single-size timing binary for the big-N shell pipeline (benchmark.sh).

Analog of the reference's examples/{benchmark,rustfft,fftwrb}.rs timing
binaries: one library, one size, prints seconds-per-iteration to stdout.
Small-n iterations are batched inside one measurement to beat clock
granularity (reference examples/benchmark.rs:8-17) — and here, to amortize
the TPU dispatch tunnel.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lib", required=True,
                    choices=["phastft", "numpy", "scipy"])
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--precision", default="f64", choices=["f64", "f32"])
    args = ap.parse_args()
    n = args.n
    dtype = np.float64 if args.precision == "f64" else np.float32
    rng = np.random.default_rng(0)

    if args.lib == "phastft":
        import jax.numpy as jnp

        from phastft_tpu.ops.dit import build_fast_fft
        from phastft_tpu.options import Options
        from phastft_tpu.planner import PlannerDit32, PlannerDit64
        from phastft_tpu.utils.timing import chain_time

        p = (PlannerDit64 if dtype == np.float64 else PlannerDit32)(n)
        # honor the planner's engine choice (df64/oz win for large f64).
        # startswith, not ==: "df64-oz"/"df64-split" are engine variants
        # (an == here once leaked the oz 2^13 leaf geometry into a native
        # plan — the round-4 stale-series pathology).
        engine = p.options.f64_engine or "native"
        if dtype == np.float64 and engine.startswith("df64"):
            from phastft_tpu.ops.dit import build_dd_fft

            sfx = engine.split("-", 1)[1] if "-" in engine else None
            run = build_dd_fft(
                n, p.options.leaf_fft_size, False, None,
                sfx if sfx in ("split", "fused", "xla") else None,
            )
            fft_args = p.dd_state
            # dd chains above k ~ 8 hit the XLA:TPU scan-of-scan compile
            # pathology (docs/ARCHITECTURE.md)
            k = max(4, min(args.iters, 6))
        else:
            run = build_fast_fft(n, p.options.leaf_fft_size, False)
            fft_args = (p.fast_tables, p.leaf_corrs)
            k = max(4, min(args.iters, 32))
        re = jnp.asarray(rng.standard_normal(n), dtype)
        im = jnp.asarray(rng.standard_normal(n), dtype)
        t = chain_time(
            lambda r, i: run(r, i, *fft_args),
            (re, im),
            k_lo=2,
            k_hi=2 + k,
        )
        print(t)
        return

    cdtype = np.complex128 if dtype == np.float64 else np.complex64
    sig = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(cdtype)
    if args.lib == "numpy":
        fft = np.fft.fft
    else:
        import scipy.fft

        fft = scipy.fft.fft
    fft(sig)  # warm any plan caches
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fft(sig)
        best = min(best, (time.perf_counter() - t0) / args.iters)
    print(best)


if __name__ == "__main__":
    main()
