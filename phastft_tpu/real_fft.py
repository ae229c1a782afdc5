"""Public R2C / C2R API: compact-spectrum real transforms.

Equivalent of the reference's public R2C/C2R family
(/root/reference/src/algorithms/r2c.rs:521-895). JAX is functional, so the
reference's out-parameter style (`r2c_fft_f64(&signal, &mut out_re, &mut
out_im)`) becomes value-returning; the zero-allocation scratch variants
(`_with_planner_and_scratch`, r2c.rs:740-799) collapse into buffer
donation — the compiled executables reuse the input spectrum buffers as
the inner FFT workspace in HBM, which is the same "output doubles as
scratch" design (README.md:82-84) expressed the XLA way.

Layout contract (r2c.rs:19-24): the forward output is the compact
``N/2 + 1`` spectrum; bins k in (N/2, N) are derivable via
``X[N-k] = conj(X[k])``; DC and Nyquist bins are purely real.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .errors import (
    LengthMismatchError,
    NonPowerOfTwoError,
    PlannerSizeMismatchError,
    ensure_power_of_two,
)
from .planner import PlannerR2c32, PlannerR2c64
from .ops.r2c import (
    C2R_COMPOSITE_MIN_N,
    build_c2r_composite,
    build_c2r_composite_dd,
    build_c2r_fft,
    build_c2r_fft_dd,
    build_r2c_fft,
    build_r2c_fft_dd,
)

__all__ = [
    "r2c_fft_f64",
    "r2c_fft_f32",
    "r2c_fft_f64_with_planner",
    "r2c_fft_f32_with_planner",
    "c2r_fft_f64",
    "c2r_fft_f32",
    "c2r_fft_f64_with_planner",
    "c2r_fft_f32_with_planner",
    "c2r_fft_f64_with_planner_and_scratch",
    "c2r_fft_f32_with_planner_and_scratch",
]


@functools.lru_cache(maxsize=64)
def _cached_planner(n: int, bits: int):
    return PlannerR2c64(n) if bits == 64 else PlannerR2c32(n)


def _dd_engine(planner):
    """The inner half-length transform's f64 engine, resolved from the
    inner DIT planner's options. Returns the dd-leaf suffix sentinel
    (None for the measured default) when the engine is a df64 variant,
    or the string "native" otherwise.

    This is the R2C analog of fft._run's engine dispatch: the reference
    runs R2C's inner FFT through the same optimized C2C path as the
    public API (r2c.rs:555-582), which is what makes R2C ~2x faster
    than a zero-imag C2C (README.md:77-78) — so the fast f64 engines
    must reach the inner transform here too."""
    if planner.dtype != np.float64:
        return "native"
    engine = planner.dit_planner.options.f64_engine or "native"
    if not engine.startswith("df64"):
        return "native"
    suffix = engine.split("-", 1)[1] if "-" in engine else None
    return ("dd", suffix if suffix in ("split", "fused", "xla") else None)


def _r2c(signal, planner):
    signal = jnp.asarray(signal, planner.dtype)
    n = int(signal.shape[-1])
    log_n = ensure_power_of_two(n)
    if n < 4:
        raise NonPowerOfTwoError(
            f"R2C requires n to be a power of 2 and n >= 4, got {n}"
        )
    if planner.n != n:
        raise PlannerSizeMismatchError(
            f"planner is for size {planner.n} but input has size {n}; "
            "planner size must match the input size"
        )
    iopts = planner.dit_planner.options
    engine = _dd_engine(planner)
    if engine != "native":
        run = build_r2c_fft_dd(n, iopts.leaf_fft_size, iopts.use_pallas,
                               engine[1])
        tables, corrs = planner.dit_planner.dd_state
        return run(signal, tables, corrs,
                   planner.twiddles_re, planner.twiddles_im)
    run = build_r2c_fft(n, iopts.leaf_fft_size, iopts.use_pallas,
                        iopts.leaf_kernel, iopts.col_engine)
    return run(
        signal,
        planner.dit_planner.fast_tables,
        planner.dit_planner.leaf_corrs,
        planner.twiddles_re,
        planner.twiddles_im,
    )


def _c2r(spec_re, spec_im, planner):
    spec_re = jnp.asarray(spec_re, planner.dtype)
    spec_im = jnp.asarray(spec_im, planner.dtype)
    if spec_re.shape != spec_im.shape:
        raise LengthMismatchError(
            f"spec_re and spec_im must be of equal length, got "
            f"{spec_re.shape} and {spec_im.shape}"
        )
    np1 = int(spec_re.shape[-1])
    n = planner.n
    if np1 != n // 2 + 1:
        raise LengthMismatchError(
            f"spec_re must have length N/2 + 1 = {n // 2 + 1}, got {np1}"
        )
    # Large sizes dispatch the three-executable composite: one fused
    # program sends XLA:TPU layout analysis into 20-30 min compiles at
    # n >= 2^22 (ops/r2c.C2R_COMPOSITE_MIN_N has the measurements).
    # Embedding C2R inside your own jit still works at any size via
    # build_c2r_fft; only this eager path switches structure.
    iopts = planner.dit_planner.options
    engine = _dd_engine(planner)
    if engine != "native":
        build = (
            build_c2r_composite_dd
            if n >= C2R_COMPOSITE_MIN_N
            else build_c2r_fft_dd
        )
        run = build(n, iopts.leaf_fft_size, iopts.use_pallas, engine[1])
        tables, corrs = planner.dit_planner.dd_state
        return run(spec_re, spec_im, tables, corrs,
                   planner.c2r_twiddles_re, planner.c2r_twiddles_im)
    build = (
        build_c2r_composite
        if n >= C2R_COMPOSITE_MIN_N
        else build_c2r_fft
    )
    run = build(n, iopts.leaf_fft_size, iopts.use_pallas,
                iopts.leaf_kernel, iopts.col_engine)
    return run(
        spec_re,
        spec_im,
        planner.dit_planner.fast_tables,
        planner.dit_planner.leaf_corrs,
        planner.c2r_twiddles_re,
        planner.c2r_twiddles_im,
    )


def r2c_fft_f64_with_planner(signal, planner):
    """Forward R2C with a reusable planner (r2c.rs:535-593).
    Returns (spec_re, spec_im) of length N/2 + 1."""
    return _r2c(signal, planner)


def r2c_fft_f32_with_planner(signal, planner):
    """f32 forward R2C with a reusable planner (r2c.rs:598-662)."""
    return _r2c(signal, planner)


def r2c_fft_f64(signal):
    """Forward R2C, auto-planned (r2c.rs:521).

    ~2x faster than a zero-imaginary C2C of the same length
    (README.md:77-78) — the inner complex FFT is half-length."""
    n = int(np.shape(signal)[-1]) if np.ndim(signal) else 0
    ensure_power_of_two(max(n, 1))
    return _r2c(signal, _cached_planner(n, 64))


def r2c_fft_f32(signal):
    """f32 forward R2C, auto-planned."""
    n = int(np.shape(signal)[-1]) if np.ndim(signal) else 0
    ensure_power_of_two(max(n, 1))
    return _r2c(signal, _cached_planner(n, 32))


def c2r_fft_f64_with_planner(spec_re, spec_im, planner):
    """Inverse C2R with a reusable planner (r2c.rs:710-727).
    Returns the length-N real signal."""
    return _c2r(spec_re, spec_im, planner)


def c2r_fft_f32_with_planner(spec_re, spec_im, planner):
    """f32 inverse C2R with a reusable planner (r2c.rs:804-895)."""
    return _c2r(spec_re, spec_im, planner)


def c2r_fft_f64(spec_re, spec_im):
    """Inverse C2R, auto-planned (r2c.rs:695)."""
    np1 = int(np.shape(spec_re)[-1]) if np.ndim(spec_re) else 0
    n = 2 * (np1 - 1)
    ensure_power_of_two(max(n, 1))
    return _c2r(spec_re, spec_im, _cached_planner(n, 64))


def c2r_fft_f32(spec_re, spec_im):
    """f32 inverse C2R, auto-planned."""
    np1 = int(np.shape(spec_re)[-1]) if np.ndim(spec_re) else 0
    n = 2 * (np1 - 1)
    ensure_power_of_two(max(n, 1))
    return _c2r(spec_re, spec_im, _cached_planner(n, 32))


def c2r_fft_f64_with_planner_and_scratch(spec_re, spec_im, planner, scratch=None):
    """Zero-allocation C2R (r2c.rs:740-799). On TPU the scratch buffers are
    subsumed by buffer donation: the compiled executable reuses the donated
    spectrum buffers as the inner-FFT workspace, so the hot path allocates
    nothing beyond the output. ``scratch`` is accepted for call-site parity
    and ignored."""
    del scratch
    return _c2r(spec_re, spec_im, planner)


def c2r_fft_f32_with_planner_and_scratch(spec_re, spec_im, planner, scratch=None):
    """f32 variant of :func:`c2r_fft_f64_with_planner_and_scratch`."""
    del scratch
    return _c2r(spec_re, spec_im, planner)
