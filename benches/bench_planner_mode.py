#!/usr/bin/env python
"""Heuristic-vs-Tune planner-mode benchmark.

Python re-design of /root/reference/benches/planner_mode.rs: the same FFT
call with a Heuristic-mode and a Tune-mode planner over
PLANNER_MODE_LENGTHS (cap 2^18, reference benches/common/mod.rs:45). The
reference's Tune is a reserved no-op, so its bench pins API parity; here
Tune runs a real measured search (phastft_tpu/tune.py), so this bench is
the evidence that tuned plans execute at least as fast as heuristic ones.

Each sample also records the plan-construction time for its mode
(Tune's includes the candidate search on a cold wisdom cache; warm-cache
reruns are disk-bound).

Usage:
  python benches/bench_planner_mode.py [--min-log 8] [--max-log 18]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from benches import common  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-log", type=int, default=8)
    ap.add_argument("--max-log", type=int, default=18)
    args = ap.parse_args()

    import jax.numpy as jnp

    common.enable_compile_cache()  # noqa: F401

    from phastft_tpu.ops.dit import build_fast_fft
    from phastft_tpu.planner import (
        PlannerDit32,
        PlannerDit64,
        PlannerMode,
    )
    from phastft_tpu.utils.timing import chain_time

    def span(n: int) -> int:
        return max(6, min(512, (1 << 26) // max(n, 1)))

    lengths = [
        n
        for n in common.PLANNER_MODE_LENGTHS
        if args.min_log <= (n.bit_length() - 1) <= args.max_log
    ]
    for group, cls, dtype in (
        ("planner_mode_f64", PlannerDit64, np.float64),
        ("planner_mode_f32", PlannerDit32, np.float32),
    ):
        for n in lengths:
            re, im = common.split_complex(n, dtype)
            dre, dim_ = jnp.asarray(re), jnp.asarray(im)
            for series, mode in (
                ("Heuristic", PlannerMode.Heuristic),
                ("Tune", PlannerMode.Tune),
            ):
                t0 = time.perf_counter()
                p = cls.with_mode(n, mode)
                plan_s = time.perf_counter() - t0
                # honor the planned engine (Tune may select df64 for f64)
                eng = p.options.f64_engine or "native"
                if dtype == np.float64 and eng.startswith("df64"):
                    from phastft_tpu.ops.dit import build_dd_fft

                    dd_leaf = eng.split("-", 1)[1] if "-" in eng else None
                    run = build_dd_fft(n, p.options.leaf_fft_size, False,
                                       None, dd_leaf)
                    rargs = p.dd_state
                else:
                    # the planned engine knobs must reach the lowering,
                    # or Tune's winners would not execute as tuned
                    run = build_fast_fft(
                        n, p.options.leaf_fft_size, False,
                        p.options.use_pallas, p.options.leaf_kernel,
                        p.options.col_engine,
                    )
                    rargs = (p.fast_tables, p.leaf_corrs)
                t = chain_time(
                    lambda r, i: run(r, i, *rargs),
                    (dre, dim_),
                    k_lo=2,
                    k_hi=2 + span(n),
                )
                common.write_sample(
                    group,
                    series,
                    n,
                    t,
                    plan_seconds=plan_s,
                    leaf_fft_size=p.options.leaf_fft_size,
                    f64_engine=p.options.f64_engine,
                    gflops=common.fft_gflops(n, t),
                )
                print(
                    f"{group:18s} {series:10s} n=2^{n.bit_length()-1:<3d} "
                    f"{t*1e3:10.4f} ms   (plan {plan_s*1e3:.1f} ms, "
                    f"leaf 2^{p.options.leaf_fft_size.bit_length()-1})"
                )


if __name__ == "__main__":
    main()
