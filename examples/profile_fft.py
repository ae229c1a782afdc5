#!/usr/bin/env python
"""Profile one big FFT — analog of the reference's examples/profile.rs
(single large transform under a profiler). Writes a JAX profiler trace
(XPlane; TensorBoard-compatible) with per-HLO device timings."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2-n", type=int, default=22)
    ap.add_argument("--dtype", default="f64", choices=["f64", "f32"])
    ap.add_argument("--out", default="/tmp/phastft-profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from phastft_tpu.ops.dit import build_fast_fft
    from phastft_tpu.options import Options
    from phastft_tpu.planner import PlannerDit32, PlannerDit64

    n = 1 << args.log2_n
    dtype = np.float64 if args.dtype == "f64" else np.float32
    p = (PlannerDit64 if dtype == np.float64 else PlannerDit32)(n)
    run = build_fast_fft(n, p.options.leaf_fft_size, False)

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal(n), dtype)
    im = jnp.asarray(rng.standard_normal(n), dtype)

    # warm-up compile outside the trace
    out = run(re, im, p.fast_tables, p.leaf_corrs)
    jax.block_until_ready(out)
    re = jnp.asarray(rng.standard_normal(n), dtype)
    im = jnp.asarray(rng.standard_normal(n), dtype)

    logdir = os.path.join(args.out, time.strftime("%Y%m%d-%H%M%S"))
    with jax.profiler.trace(logdir):
        for _ in range(5):
            re, im = run(re, im, p.fast_tables, p.leaf_corrs)
        jax.block_until_ready((re, im))
    print(f"trace written to {logdir}")
    print("view with: tensorboard --logdir", args.out)


if __name__ == "__main__":
    main()
