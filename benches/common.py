"""Shared benchmark configuration.

Python re-design of the reference's criterion common module
(/root/reference/benches/common/mod.rs): one shared size sweep, sample
policy, throughput models, data generators, and a snake_case group /
PascalCase series registry, so every runner and the plotters agree.

Timing policy: on TPU the chain-slope method (phastft_tpu.utils.timing)
replaces criterion's statistical sampling — wall-clock per call lies
through the async tunnel. On host (numpy/scipy baselines) we keep a
median-of-k wall-clock like criterion (SAMPLE_SIZE = 20,
benches/common/mod.rs:50).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Size sweeps (benches/common/mod.rs:33-45)
# Default sweep 2^6..2^24 mirrors the reference (benches/common/mod.rs:
# 33-35); every runner filters by --min-log/--max-log (default cap 24),
# so the extra ceiling sizes 2^25..2^28 only run when asked for
# (single-chip size-ceiling sweeps).
LENGTHS = [1 << lg for lg in range(6, 29)]  # 2^6 .. 2^28
BIT_REVERSAL_LENGTHS = [1 << lg for lg in range(10, 25)]
PLANNER_MODE_LENGTHS = [1 << lg for lg in range(6, 19)]
SAMPLE_SIZE = 20

# group registry: snake_case groups, PascalCase series ids
# (benches/common/mod.rs:231-280)
GROUPS = {
    "c2c_f64_forward": "PhastftTpu",
    "c2c_f64_inverse": "PhastftTpu",
    "c2c_f32_forward": "PhastftTpu",
    "c2c_f32_inverse": "PhastftTpu",
    "r2c_f64_forward": "PhastftTpu",
    "c2r_f64_inverse": "PhastftTpu",
    "r2c_f32_forward": "PhastftTpu",
    "c2r_f32_inverse": "PhastftTpu",
    "planner_construction": "PhastftTpu",
    "kernel_bit_reversal": "PhastftTpu",
    # Heuristic-vs-Tune execution on the same call, cap 2^18
    # (reference benches/planner_mode.rs + common/mod.rs:45)
    "planner_mode_f64": "Heuristic",
    "planner_mode_f32": "Heuristic",
    # interleave/deinterleave conversion kernels
    # (reference benches/interleave.rs)
    "kernel_deinterleave_f64": "Native",
    "kernel_deinterleave_f32": "Native",
    "kernel_combine_f64": "Native",
    "kernel_combine_f32": "Native",
}

OUT_DIR = os.environ.get(
    "PHASTFT_BENCH_OUT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "out"),
)


def enable_compile_cache() -> None:
    """Point JAX at the repo's persistent compile cache. The heavyweight
    shapes (C2R composites at n >= 2^22 compile for 10-25 min through the
    remote-AOT service) then survive across sweep runs and retries.
    Best-effort: harmless if the backend ignores it."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def throughput_complex(n: int, dtype, seconds: float) -> float:
    """GiB/s of complex samples moved once (common/mod.rs:91-105)."""
    bytes_ = 2 * n * np.dtype(dtype).itemsize
    return bytes_ / seconds / 2**30


def throughput_real(n: int, dtype, seconds: float) -> float:
    bytes_ = n * np.dtype(dtype).itemsize
    return bytes_ / seconds / 2**30


def fft_gflops(n: int, seconds: float) -> float:
    """Standard 5 N log2 N FFT flop model."""
    return 5.0 * n * (n.bit_length() - 1) / seconds / 1e9


# ---- data generators (benches/common/mod.rs:112-218) ----


def split_complex(n: int, dtype, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(n).astype(dtype),
        rng.standard_normal(n).astype(dtype),
    )


def interleaved_complex(n: int, dtype, seed=0):
    re, im = split_complex(n, dtype, seed)
    c = np.complex64 if np.dtype(dtype) == np.float32 else np.complex128
    return (re + 1j * im).astype(c)


def real_signal(n: int, dtype, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(dtype)


def spectrum_split(n: int, dtype, seed=0):
    """Valid compact R2C spectrum: DC/Nyquist imag zeroed
    (common/mod.rs:173-218)."""
    rng = np.random.default_rng(seed)
    sre = rng.standard_normal(n // 2 + 1).astype(dtype)
    sim = rng.standard_normal(n // 2 + 1).astype(dtype)
    sim[0] = 0.0
    sim[-1] = 0.0
    return sre, sim


# ---- host-side timing (baseline libraries) ----


def median_time(fn, *, samples: int = SAMPLE_SIZE, budget_s: float = 5.0):
    """Median wall time of fn() over up to `samples` runs within a budget."""
    times = []
    t_start = time.perf_counter()
    for _ in range(samples):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        if time.perf_counter() - t_start > budget_s:
            break
    return float(np.median(times))


def write_sample(group: str, series: str, n: int, seconds: float,
                 samples=None, **extra):
    """Persist one sample to benches/out/<group>/<series>/<n>.json — the
    analog of criterion's sample tree that plot_criterion_overlay.py walks
    (reference benches/README.md:65-72).

    ``samples``: optional list of repeated per-call measurements (>= 3 on
    device sweeps) so plots can draw dispersion (criterion records 20
    samples per point, common/mod.rs:50); ``seconds`` stays the point
    estimate (median)."""
    d = os.path.join(OUT_DIR, group, series)
    os.makedirs(d, exist_ok=True)
    payload = {"n": n, "seconds": seconds, **extra}
    if samples is not None:
        payload["samples"] = [float(s) for s in samples]
    with open(os.path.join(d, f"{n}.json"), "w") as f:
        json.dump(payload, f)
    return payload
