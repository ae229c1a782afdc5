#!/usr/bin/env python
"""phastft_tpu benchmark runner — one binary per library, like the
reference's per-library criterion binaries (/root/reference/benches/bench.rs;
separation rationale: benches/README.md:43-50).

Usage:
  python benches/bench_phastft.py [--groups c2c_f64_forward,...]
                                  [--min-log 6] [--max-log 24]

Writes criterion-style sample JSONs under benches/out/<group>/PhastftTpu/.
Timing: chain-slope on device (see phastft_tpu/utils/timing.py).
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from benches import common  # noqa: E402



def _span(n: int) -> int:
    """Chain length so the k_hi - k_lo delta clears tunnel jitter even for
    microsecond transforms (same policy as tune._measure)."""
    return max(6, min(512, (1 << 26) // max(n, 1)))


def _span_dd(n: int) -> int:
    """Chains around the df64 pipeline (its own chunked inner scan plus a
    Pallas call) hit the XLA:TPU scan-of-scan compile pathology when long
    (docs/ARCHITECTURE.md); k <= 8 compiles in normal time."""
    return min(6, _span(n))

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", default=",".join(common.GROUPS))
    ap.add_argument("--min-log", type=int, default=6)
    ap.add_argument("--max-log", type=int, default=24)
    ap.add_argument(
        "--skip-existing",
        action="store_true",
        help="skip (group, n) pairs that already have a sample file — "
        "resume support after an interrupted sweep",
    )
    args = ap.parse_args()
    groups = set(args.groups.split(","))

    if args.skip_existing:

        def has_sample(group: str, n: int) -> bool:
            return os.path.exists(
                os.path.join(common.OUT_DIR, group, "PhastftTpu",
                             f"{n}.json")
            )

        orig_groups = groups

        def groups_for(n: int):
            return {g for g in orig_groups if not has_sample(g, n)}

    else:

        def groups_for(n: int):
            return groups
    lengths = [
        n
        for n in common.LENGTHS
        if args.min_log <= (n.bit_length() - 1) <= args.max_log
    ]

    import jax.numpy as jnp

    common.enable_compile_cache()

    from phastft_tpu.ops.dit import build_fast_fft
    from phastft_tpu.ops.r2c import (
        C2R_COMPOSITE_MIN_N,
        build_c2r_composite,
        build_c2r_fft,
        build_r2c_fft,
    )
    from phastft_tpu.planner import (
        PlannerDit32,
        PlannerDit64,
        PlannerR2c32,
        PlannerR2c64,
    )
    from phastft_tpu.ops.bitrev import apply_bit_reversal
    from phastft_tpu.utils.timing import chain_time_samples
    import jax

    def chain_time(step, args, **kw):
        # >= 3 independent slope estimates per point (dispersion for the
        # plots; criterion records 20 samples, common/mod.rs:50). Returns
        # the median and stashes the samples for report().
        ts = chain_time_samples(step, args, samples=3, **kw)
        chain_time.last_samples = sorted(ts)
        return float(np.median(ts))

    def report(group, n, t, dtype, samples=None):
        common.write_sample(
            group,
            "PhastftTpu",
            n,
            t,
            samples=samples
            if samples is not None
            else getattr(chain_time, "last_samples", None),
            gflops=common.fft_gflops(n, t),
            gibps=common.throughput_complex(n, dtype, t),
        )
        print(f"{group:24s} n=2^{n.bit_length()-1:<3d} {t*1e3:10.4f} ms")

    from phastft_tpu.ops.dit import build_dd_fft

    for n in lengths:
        groups = groups_for(n)
        if "c2c_f64_forward" in groups or "c2c_f64_inverse" in groups:
            p = PlannerDit64(n)
            leaf = p.options.leaf_fft_size
            # honor the planner's engine choice (df64 for large f64)
            eng = p.options.f64_engine or "native"
            dd = eng.startswith("df64")
            dd_leaf = eng.split("-", 1)[1] if "-" in eng else None
            re, im = common.split_complex(n, np.float64)
            dre, dim_ = jnp.asarray(re), jnp.asarray(im)
            for group, scale in (
                ("c2c_f64_forward", False),
                ("c2c_f64_inverse", True),
            ):
                if group not in groups:
                    continue
                if dd:
                    run = build_dd_fft(n, leaf, scale, None, dd_leaf)
                    args2 = p.dd_state
                else:
                    run = build_fast_fft(n, leaf, scale)
                    args2 = (p.fast_tables, p.leaf_corrs)
                t = chain_time(
                    lambda r, i: run(r, i, *args2),
                    (dre, dim_),
                    k_lo=2,
                    k_hi=2 + (_span_dd(n) if dd else _span(n)),
                )
                report(group, n, t, np.float64)
        if "c2c_f32_forward" in groups or "c2c_f32_inverse" in groups:
            p = PlannerDit32(n)
            leaf = p.options.leaf_fft_size
            re, im = common.split_complex(n, np.float32)
            dre, dim_ = jnp.asarray(re), jnp.asarray(im)
            for group, scale in (
                ("c2c_f32_forward", False),
                ("c2c_f32_inverse", True),
            ):
                if group not in groups:
                    continue
                run = build_fast_fft(n, leaf, scale)
                t = chain_time(
                    lambda r, i: run(r, i, p.fast_tables, p.leaf_corrs),
                    (dre, dim_),
                    k_lo=2,
                    k_hi=2 + _span(n),
                )
                report(group, n, t, np.float32)
        if "r2c_f64_forward" in groups and n >= 4:
            p = PlannerR2c64(n)
            x = jnp.asarray(common.real_signal(n, np.float64))
            # engine dispatch mirrors real_fft._r2c: the inner transform
            # rides the planner's f64 engine (round-4 verdict item 1)
            r2c_eng = p.dit_planner.options.f64_engine or "native"
            if r2c_eng.startswith("df64"):
                from phastft_tpu.ops.r2c import build_r2c_fft_dd

                sfx = (
                    r2c_eng.split("-", 1)[1] if "-" in r2c_eng else None
                )
                run = build_r2c_fft_dd(
                    n, p.dit_planner.options.leaf_fft_size, None,
                    sfx if sfx in ("split", "fused", "xla") else None,
                )
                rt_, rc_ = p.dit_planner.dd_state
                r_args = (rt_, rc_, p.twiddles_re, p.twiddles_im)
            else:
                run = build_r2c_fft(n, p.dit_planner.options.leaf_fft_size)
                r_args = (
                    p.dit_planner.fast_tables,
                    p.dit_planner.leaf_corrs,
                    p.twiddles_re,
                    p.twiddles_im,
                )

            # R2C changes shape; chain by repacking the spectrum into a
            # length-n carry (concat bias ~1 elementwise pass, biasing
            # r2c slightly SLOW — conservative for the 2x-vs-C2C claim)
            def step(sig):
                sre, sim = run(sig, *r_args)
                return jnp.concatenate([sre[:-1], sim[:-1]])

            t = chain_time(lambda s: step(s), (x,), k_lo=2,
                           k_hi=2 + min(_span(n), 6))
            report("r2c_f64_forward", n, t, np.float64)
        if "c2r_f64_inverse" in groups and n >= 4:
            p = PlannerR2c64(n)
            sre, sim = common.spectrum_split(n, np.float64)
            # same structure switch as the public real_fft path: the
            # fused program's compile goes pathological at n >= 2^22;
            # engine dispatch mirrors real_fft._c2r (dd fast path)
            c2r_eng = p.dit_planner.options.f64_engine or "native"
            if c2r_eng.startswith("df64"):
                from phastft_tpu.ops.r2c import (
                    build_c2r_composite_dd,
                    build_c2r_fft_dd,
                )

                sfx = (
                    c2r_eng.split("-", 1)[1] if "-" in c2r_eng else None
                )
                builder = (
                    build_c2r_composite_dd
                    if n >= C2R_COMPOSITE_MIN_N
                    else build_c2r_fft_dd
                )
                run = builder(
                    n, p.dit_planner.options.leaf_fft_size, None,
                    sfx if sfx in ("split", "fused", "xla") else None,
                )
                ct_, cc_ = p.dit_planner.dd_state
                args_c = (ct_, cc_, p.c2r_twiddles_re, p.c2r_twiddles_im)
            else:
                builder = (
                    build_c2r_composite
                    if n >= C2R_COMPOSITE_MIN_N
                    else build_c2r_fft
                )
                run = builder(n, p.dit_planner.options.leaf_fft_size)
                args_c = (
                    p.dit_planner.fast_tables,
                    p.dit_planner.leaf_corrs,
                    p.c2r_twiddles_re,
                    p.c2r_twiddles_im,
                )
            dsr, dsi = jnp.asarray(sre), jnp.asarray(sim)
            if n <= (1 << 21):

                def step_c2r(a, b):
                    sig = run(a, b, *args_c)
                    return a * 0.999 + sig.sum() * 0, b * 0.999

                t = chain_time(
                    step_c2r, (dsr, dsi), k_lo=2, k_hi=2 + _span(n)
                )
            else:
                # scan-of-scan chains trigger the XLA:TPU concat->scan
                # compile pathology above 2^21 (docs/ARCHITECTURE.md);
                # serial dispatch-batch differencing instead. The c2r
                # executable donates its spectrum buffers, so each call
                # consumes a fresh on-device copy whose cost is measured
                # and subtracted.
                from phastft_tpu.utils.timing import serial_time

                copier = jax.jit(lambda a, b: (a + 0.0, b + 0.0))

                def one_call():
                    a, b = copier(dsr, dsi)
                    return run(a, b, *args_c)

                ts = [
                    serial_time(one_call, reps=1)
                    - serial_time(lambda: copier(dsr, dsi), reps=1)
                    for _ in range(3)
                ]
                t = float(np.median(ts))
                chain_time.last_samples = sorted(ts)
            report("c2r_f64_inverse", n, t, np.float64)
        if "r2c_f32_forward" in groups and n >= 4:
            p32r = PlannerR2c32(n)
            x = jnp.asarray(common.real_signal(n, np.float32))
            run = build_r2c_fft(n, p32r.dit_planner.options.leaf_fft_size)

            def step32(sig):
                sre, sim = run(
                    sig,
                    p32r.dit_planner.fast_tables,
                    p32r.dit_planner.leaf_corrs,
                    p32r.twiddles_re,
                    p32r.twiddles_im,
                )
                return sig * 0.999 + sre.sum() * 0

            t = chain_time(lambda s: step32(s), (x,), k_lo=2,
                           k_hi=2 + _span(n))
            report("r2c_f32_forward", n, t, np.float32)
        if "c2r_f32_inverse" in groups and n >= 4:
            p32r = PlannerR2c32(n)
            sre, sim = common.spectrum_split(n, np.float32)
            builder32 = (
                build_c2r_composite
                if n >= C2R_COMPOSITE_MIN_N
                else build_c2r_fft
            )
            run = builder32(n, p32r.dit_planner.options.leaf_fft_size)
            dsr, dsi = jnp.asarray(sre), jnp.asarray(sim)
            args32 = (
                p32r.dit_planner.fast_tables,
                p32r.dit_planner.leaf_corrs,
                p32r.c2r_twiddles_re,
                p32r.c2r_twiddles_im,
            )
            if n <= (1 << 21):

                def step_c2r32(a, b):
                    sig = run(a, b, *args32)
                    return a * 0.999 + sig.sum() * 0, b * 0.999

                t = chain_time(
                    step_c2r32, (dsr, dsi), k_lo=2, k_hi=2 + _span(n)
                )
            else:
                from phastft_tpu.utils.timing import serial_time

                copier32 = jax.jit(lambda a, b: (a + 0.0, b + 0.0))

                def one_call32():
                    a, b = copier32(dsr, dsi)
                    return run(a, b, *args32)

                ts = [
                    serial_time(one_call32, reps=1)
                    - serial_time(lambda: copier32(dsr, dsi), reps=1)
                    for _ in range(3)
                ]
                t = float(np.median(ts))
                chain_time.last_samples = sorted(ts)
            report("c2r_f32_inverse", n, t, np.float32)
        if "kernel_bit_reversal" in groups and n >= 1024:
            x = jnp.asarray(common.real_signal(n, np.float64))
            f = jax.jit(lambda a: apply_bit_reversal(a, n, True))
            # a permutation is ONE memory pass — far cheaper per element
            # than an FFT — so it needs a much longer chain for the
            # k_hi - k_lo delta to clear the ~1 ms tunnel jitter
            span_br = max(64, min(4096, (1 << 31) // max(n, 1)))
            t = chain_time(lambda a: f(a), (x,), k_lo=2, k_hi=2 + span_br)
            report("kernel_bit_reversal", n, t, np.float64)

    if "planner_construction" in set(args.groups.split(",")):
        # planner-construction cost, vs other libraries' plan time; both
        # DIT and R2C planners, mirroring the reference's two series
        # (reference benches/planner.rs:8-30)
        import time as _time

        for series, cls in (
            ("PhastftTpu", PlannerDit64),
            ("PhastftTpuR2c", PlannerR2c64),
        ):
            for n in lengths:
                if n > 1 << 18:  # PLANNER_MODE_LENGTHS cap (common/mod.rs:45)
                    continue
                times = []
                for _ in range(5):
                    t0 = _time.perf_counter()
                    cls(n)
                    times.append(_time.perf_counter() - t0)
                t = float(np.median(times))
                common.write_sample("planner_construction", series, n, t,
                                    samples=sorted(times))
                print(
                    f"planner_construction {series:14s} "
                    f"n=2^{n.bit_length()-1:<3d} {t*1e3:10.4f} ms"
                )


if __name__ == "__main__":
    main()
