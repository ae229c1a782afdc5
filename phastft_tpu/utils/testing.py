"""Test-support utilities.

Equivalent of the reference's `utilities` crate
(/root/reference/utilities/src/lib.rs): float-closeness assertion and
unit-L2-norm random signal generators. The correctness oracle here is
numpy's FFT (the reference uses rustfft, utilities/src/lib.rs:1).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "assert_float_closeness",
    "gen_random_signal_f64",
    "gen_random_signal_f32",
    "rel_l2_error",
]


def assert_float_closeness(actual, expected, epsilon):
    """Elementwise |actual - expected| < epsilon assertion
    (utilities/src/lib.rs:17-24)."""
    actual = np.asarray(actual)
    expected = np.asarray(expected)
    diff = np.abs(actual - expected)
    worst = float(diff.max()) if diff.size else 0.0
    assert np.all(diff < epsilon), (
        f"max |actual - expected| = {worst} >= epsilon = {epsilon}"
    )


def _gen(n: int, dtype, seed):
    """Random complex signal normalized to unit L2 norm over (re, im)
    jointly, mirroring utilities/src/lib.rs:26-75."""
    rng = np.random.default_rng(seed)
    re = rng.standard_normal(n)
    im = rng.standard_normal(n)
    norm = np.sqrt(np.sum(re * re + im * im))
    return (re / norm).astype(dtype), (im / norm).astype(dtype)


def gen_random_signal_f64(n: int, seed=0):
    return _gen(n, np.float64, seed)


def gen_random_signal_f32(n: int, seed=0):
    return _gen(n, np.float32, seed)


def rel_l2_error(got_re, got_im, want: np.ndarray) -> float:
    """Relative L2 error of planar (re, im) vs a complex oracle array."""
    got = np.asarray(got_re, np.float64) + 1j * np.asarray(got_im, np.float64)
    denom = np.linalg.norm(want)
    if denom == 0:
        return float(np.linalg.norm(got - want))
    return float(np.linalg.norm(got - want) / denom)
