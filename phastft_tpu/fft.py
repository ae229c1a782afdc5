"""Public C2C API: validation, direction handling, executable dispatch.

TPU-native equivalent of /root/reference/src/lib.rs:142-226 (`fft_64_dit`,
`fft_32_dit`, `_with_planner`, `_with_planner_and_opts`) and the entry path
of /root/reference/src/algorithms/dit.rs:263-332. JAX is functional, so the
reference's in-place `&mut` contract becomes "arrays in, arrays out" with
buffer donation making the device execution in-place.

Contracts preserved (SURVEY §2 "numerical/layout contracts"):
* normal-order input, normal-order output;
* only the inverse scales, by 1/N;
* errors on non-power-of-2 length, length mismatch, planner-size mismatch,
  with messages mirroring the reference's panics.

Extension over the reference: arrays may have leading batch dimensions; the
transform applies along the last axis (the TPU-idiomatic replacement for
looping planner reuse).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .errors import (
    LengthMismatchError,
    PhastftError,
    PlannerSizeMismatchError,
    ensure_power_of_two,
)
from .options import Options, TILED_BITREV_MIN_LOGN
from .planner import Direction, PlannerDit32, PlannerDit64
from .ops.dit import build_dd_fft, build_fast_fft, build_staged_fft

__all__ = [
    "fft_64_dit",
    "fft_32_dit",
    "fft_64_dit_with_planner",
    "fft_32_dit_with_planner",
    "fft_64_dit_with_planner_and_opts",
    "fft_32_dit_with_planner_and_opts",
]


def _validate(reals, imags, planner, dtype):
    """Shape/size validation shared by all entries (dit.rs:284-289)."""
    if reals.shape != imags.shape:
        raise LengthMismatchError(
            f"reals and imags must be of equal length, got {reals.shape} "
            f"and {imags.shape}"
        )
    n = int(reals.shape[-1])
    log_n = ensure_power_of_two(n)
    if planner.n != n:
        raise PlannerSizeMismatchError(
            f"planner is for size {planner.n} but input has size {n}; "
            "planner size must match the input size"
        )
    return n, log_n


def _coerce_direction(direction) -> Direction:
    """Accept the Direction enum or the 'f'/'r' chars of the reference's
    Python bindings (pyphastft/src/lib.rs:36-40); reject anything else."""
    if isinstance(direction, Direction):
        return direction
    if direction in ("f", "forward"):
        return Direction.Forward
    if direction in ("r", "reverse", "i", "inverse"):
        return Direction.Reverse
    raise PhastftError(
        f"direction must be Direction.Forward/Reverse or 'f'/'r', got "
        f"{direction!r}"
    )


def _run(reals, imags, direction, planner, opts: Options):
    direction = _coerce_direction(direction)
    dtype = planner.dtype
    reals = jnp.asarray(reals, dtype)
    imags = jnp.asarray(imags, dtype)
    n, log_n = _validate(reals, imags, planner, dtype)
    scale = direction is Direction.Reverse

    if opts.strategy == "staged":
        # The staged path forms (..., 2, h) minor dims at early stages —
        # exactly the tile-padding pathology documented in
        # docs/ARCHITECTURE.md — so it is a correctness oracle, not a
        # production path, on TPU backends.
        try:
            import jax

            if jax.devices()[0].platform == "tpu":
                import warnings

                warnings.warn(
                    "strategy='staged' is the reference-parity oracle; "
                    "expect it to be far slower than the default engine "
                    "on TPU (tile-padded early stages)",
                    stacklevel=3,
                )
        except Exception:
            pass
        tiled = opts.tiled_bit_reversal
        if tiled is None:
            tiled = log_n >= TILED_BITREV_MIN_LOGN
        run = build_staged_fft(n, bool(tiled), scale)
        args = (planner.stage_twiddles,)
    elif dtype == np.float64 and (
        # Explicit per-call opts win over the planner's; None defers.
        opts.f64_engine
        if opts.f64_engine is not None
        else (planner.options.f64_engine or "native")
    ).startswith("df64"):
        # fast-f64 mode: double-float paired-f32 engine (ops/df64.py).
        # "df64-split" / "df64-fused" pin the dd leaf lowering
        # (ops/fourstep.fft_rows_dd); bare "df64" uses the measured
        # default.
        engine = (
            opts.f64_engine
            if opts.f64_engine is not None
            else (planner.options.f64_engine or "native")
        )
        dd_leaf = engine.split("-", 1)[1] if "-" in engine else None
        use_pallas = (
            opts.use_pallas
            if opts.use_pallas is not None
            else planner.options.use_pallas
        )
        run = build_dd_fft(
            n, planner.options.leaf_fft_size, scale, use_pallas, dd_leaf
        )
        args = planner.dd_state
    else:
        use_pallas = (
            opts.use_pallas
            if opts.use_pallas is not None
            else planner.options.use_pallas
        )
        leaf_kernel = (
            opts.leaf_kernel
            if opts.leaf_kernel is not None
            else planner.options.leaf_kernel
        )
        col_engine = (
            opts.col_engine
            if opts.col_engine is not None
            else planner.options.col_engine
        )
        # The leaf size must match the planner's tables, so it comes from
        # the planner's own options, not the per-call opts.
        run = build_fast_fft(
            n, planner.options.leaf_fft_size, scale, use_pallas,
            leaf_kernel, col_engine
        )
        args = (planner.fast_tables, planner.leaf_corrs)

    if direction is Direction.Forward:
        return run(reals, imags, *args)
    # IFFT swap trick (src/algorithms/dit.rs:291-300): feed (im, re), swap
    # the outputs back; `scale` applied the 1/N inside the executable.
    out_re, out_im = run(imags, reals, *args)
    return out_im, out_re


# Convenience-API planner cache. The reference constructs a fresh planner
# inside `fft_64_dit` (src/lib.rs:180-184); on TPU a planner owns HBM tables
# and compiled executables, so the idiomatic convenience form memoizes.
@functools.lru_cache(maxsize=64)
def _cached_planner(n: int, bits: int):
    return PlannerDit64(n) if bits == 64 else PlannerDit32(n)


def fft_64_dit_with_planner_and_opts(reals, imags, direction, planner, opts):
    """f64 planar C2C FFT with explicit planner and options
    (src/algorithms/dit.rs:263-332). Returns (reals, imags)."""
    return _run(reals, imags, direction, planner, opts)


def fft_32_dit_with_planner_and_opts(reals, imags, direction, planner, opts):
    """f32 planar C2C FFT with explicit planner and options."""
    return _run(reals, imags, direction, planner, opts)


def fft_64_dit_with_planner(reals, imags, direction, planner):
    """f64 planar C2C FFT with a reusable planner (src/lib.rs:143)."""
    n = int(np.shape(reals)[-1]) if np.ndim(reals) else 0
    return _run(reals, imags, direction, planner, Options.guess_options(n))


def fft_32_dit_with_planner(reals, imags, direction, planner):
    """f32 planar C2C FFT with a reusable planner (src/lib.rs:186)."""
    n = int(np.shape(reals)[-1]) if np.ndim(reals) else 0
    return _run(reals, imags, direction, planner, Options.guess_options(n))


def fft_64_dit(reals, imags, direction):
    """f64 planar C2C FFT, auto-planned (src/lib.rs:180).

    Example
    -------
    >>> import numpy as np
    >>> from phastft_tpu import fft_64_dit, Direction
    >>> re, im = np.ones(8), np.zeros(8)
    >>> fre, fim = fft_64_dit(re, im, Direction.Forward)
    >>> float(fre[0])
    8.0
    """
    n = int(np.shape(reals)[-1]) if np.ndim(reals) else 0
    ensure_power_of_two(max(n, 1) if n else 0)
    planner = _cached_planner(n, 64)
    return fft_64_dit_with_planner(reals, imags, direction, planner)


def fft_32_dit(reals, imags, direction):
    """f32 planar C2C FFT, auto-planned (src/lib.rs:223)."""
    n = int(np.shape(reals)[-1]) if np.ndim(reals) else 0
    ensure_power_of_two(max(n, 1) if n else 0)
    planner = _cached_planner(n, 32)
    return fft_32_dit_with_planner(reals, imags, direction, planner)
