"""Planner construction and reuse semantics.

Mirrors the planner contracts of /root/reference/src/planner.rs: twiddle
table shapes/values, direction-agnostic reuse, R2C planner wrapping an
N/2 DIT planner with 0.5-folded untangle twiddles.
"""

import numpy as np
import pytest

from phastft_tpu import (
    Direction,
    PlannerDit32,
    PlannerDit64,
    PlannerR2c64,
    NonPowerOfTwoError,
    fft_64_dit_with_planner,
)
from phastft_tpu.utils.testing import gen_random_signal_f64


def test_stage_twiddle_shapes():
    n = 1 << 8
    p = PlannerDit64(n)
    assert p.log_n == 8
    assert len(p.stage_twiddles) == 8
    for s, (wre, wim) in enumerate(p.stage_twiddles):
        assert wre.shape == (1 << s,)
        assert wim.shape == (1 << s,)


def test_twiddle_values_exact_angles():
    p = PlannerDit64(64)
    # stage s twiddles are W_{2^(s+1)}^k = exp(-2 pi i k / 2^(s+1))
    for s, (wre, wim) in enumerate(p.stage_twiddles):
        m = 1 << (s + 1)
        k = np.arange(m // 2)
        np.testing.assert_allclose(
            np.asarray(wre), np.cos(-2 * np.pi * k / m), atol=1e-15
        )
        np.testing.assert_allclose(
            np.asarray(wim), np.sin(-2 * np.pi * k / m), atol=1e-15
        )


def test_f32_twiddles_computed_in_f64():
    # f32 tables must equal the f64 tables rounded once (src/planner.rs:148-159).
    p32 = PlannerDit32(1 << 10)
    p64 = PlannerDit64(1 << 10)
    for (w32, _), (w64, _) in zip(p32.stage_twiddles, p64.stage_twiddles):
        np.testing.assert_array_equal(
            np.asarray(w32), np.asarray(w64).astype(np.float32)
        )


def test_planner_is_direction_agnostic():
    # One planner instance drives both directions (src/planner.rs:37-39).
    n = 1 << 10
    p = PlannerDit64(n)
    re, im = gen_random_signal_f64(n)
    fre, fim = fft_64_dit_with_planner(re, im, Direction.Forward, p)
    rre, rim = fft_64_dit_with_planner(fre, fim, Direction.Reverse, p)
    np.testing.assert_allclose(np.asarray(rre), re, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rim), im, atol=1e-10)


def test_r2c_planner_structure():
    n = 1 << 8
    p = PlannerR2c64(n)
    assert p.dit_planner.n == n // 2
    assert p.twiddles_re.shape == (n // 4 + 1,)
    # 0.5 factor pre-folded (src/planner.rs:125-128)
    k = np.arange(n // 4 + 1)
    np.testing.assert_allclose(
        np.asarray(p.twiddles_re), 0.5 * np.cos(-2 * np.pi * k / n), atol=1e-15
    )
    np.testing.assert_allclose(
        np.asarray(p.twiddles_im), 0.5 * np.sin(-2 * np.pi * k / n), atol=1e-15
    )
    # full-length C2R preprocess table (lazy; concat-free uniform formula)
    assert p._c2r_tw is None  # not built until an inverse runs
    kf = np.arange(n // 2)
    np.testing.assert_allclose(
        np.asarray(p.c2r_twiddles_re),
        0.5 * np.cos(-2 * np.pi * kf / n),
        atol=1e-15,
    )
    np.testing.assert_allclose(
        np.asarray(p.c2r_twiddles_im),
        0.5 * np.sin(-2 * np.pi * kf / n),
        atol=1e-15,
    )
    assert p._c2r_tw is not None


def test_r2c_planner_minimum_size():
    # R2C requires n >= 4 (src/planner.rs:195).
    with pytest.raises(NonPowerOfTwoError):
        PlannerR2c64(2)
