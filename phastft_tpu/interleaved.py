"""Interleaved-complex public API.

Equivalent of the macro-generated wrappers in
/root/reference/src/lib.rs:41-140 (`fft_{32,64}_interleaved` and planner /
opts variants, feature `complex-nums`): deinterleave -> planar FFT ->
recombine. Documented there (src/lib.rs:48-49) — and true here — as the
copying convenience path; planar is the fast format.
"""

from __future__ import annotations

import numpy as np

from .fft import (
    fft_32_dit_with_planner_and_opts,
    fft_64_dit_with_planner_and_opts,
    _cached_planner,
    _coerce_direction,
)
from .errors import ensure_power_of_two
from .options import Options
from .ops.complex_interop import deinterleave

__all__ = [
    "fft_64_interleaved",
    "fft_32_interleaved",
    "fft_64_interleaved_with_planner",
    "fft_32_interleaved_with_planner",
    "fft_64_interleaved_with_planner_and_opts",
    "fft_32_interleaved_with_planner_and_opts",
]


def _run_interleaved(signal, direction, planner, opts, bits):
    direction = _coerce_direction(direction)
    re, im = deinterleave(signal)
    run = (
        fft_64_dit_with_planner_and_opts
        if bits == 64
        else fft_32_dit_with_planner_and_opts
    )
    out_re, out_im = run(re, im, direction, planner, opts)
    # The interleaved API is the copying convenience path (src/lib.rs:48-49);
    # results combine on host: complex128 cannot live on TPU at all, and on
    # tunneled TPU backends even complex64 device->host transfer is
    # unimplemented. Planar is the performance format.
    out_re = np.asarray(out_re)
    out_im = np.asarray(out_im)
    if bits == 32:
        return (out_re + 1j * out_im).astype(np.complex64)
    return out_re.astype(np.float64) + 1j * out_im.astype(np.float64)


def fft_64_interleaved_with_planner_and_opts(signal, direction, planner, opts):
    """Interleaved c128 FFT with explicit planner/options (src/lib.rs:41-140)."""
    return _run_interleaved(signal, direction, planner, opts, 64)


def fft_32_interleaved_with_planner_and_opts(signal, direction, planner, opts):
    """Interleaved c64 FFT with explicit planner/options."""
    return _run_interleaved(signal, direction, planner, opts, 32)


def fft_64_interleaved_with_planner(signal, direction, planner):
    n = int(np.shape(signal)[-1]) if np.ndim(signal) else 0
    return _run_interleaved(signal, direction, planner,
                            Options.guess_options(n), 64)


def fft_32_interleaved_with_planner(signal, direction, planner):
    n = int(np.shape(signal)[-1]) if np.ndim(signal) else 0
    return _run_interleaved(signal, direction, planner,
                            Options.guess_options(n), 32)


def fft_64_interleaved(signal, direction):
    """Interleaved complex128 FFT, auto-planned (src/lib.rs quickstart)."""
    n = int(np.shape(signal)[-1]) if np.ndim(signal) else 0
    ensure_power_of_two(max(n, 1))
    return fft_64_interleaved_with_planner(signal, direction,
                                           _cached_planner(n, 64))


def fft_32_interleaved(signal, direction):
    """Interleaved complex64 FFT, auto-planned; device-native on TPU."""
    n = int(np.shape(signal)[-1]) if np.ndim(signal) else 0
    ensure_power_of_two(max(n, 1))
    return fft_32_interleaved_with_planner(signal, direction,
                                           _cached_planner(n, 32))
