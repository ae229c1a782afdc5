"""Contract-violation tests.

Mirrors the reference's `#[should_panic]` tests: non-power-of-2 input
(/root/reference/src/lib.rs:238-252) and the planner-size mismatch
regression test (/root/reference/src/lib.rs:254-296).
"""

import numpy as np
import pytest

from phastft_tpu import (
    Direction,
    LengthMismatchError,
    NonPowerOfTwoError,
    PhastftError,
    PlannerDit64,
    PlannerSizeMismatchError,
    fft_64_dit,
    fft_64_dit_with_planner,
)


def test_non_power_of_two_raises():
    re = np.zeros(100)
    im = np.zeros(100)
    with pytest.raises(NonPowerOfTwoError, match="power of 2"):
        fft_64_dit(re, im, Direction.Forward)


def test_zero_length_raises():
    with pytest.raises(NonPowerOfTwoError):
        fft_64_dit(np.zeros(0), np.zeros(0), Direction.Forward)


def test_length_mismatch_raises():
    re = np.zeros(8)
    im = np.zeros(16)
    with pytest.raises(LengthMismatchError, match="equal length"):
        fft_64_dit_with_planner(re, im, Direction.Forward, PlannerDit64(8))


def test_planner_size_mismatch_raises():
    # Regression pin: planner built for half the size must be rejected
    # (src/lib.rs:254-296).
    n = 1 << 10
    planner = PlannerDit64(n // 2)
    re = np.zeros(n)
    im = np.zeros(n)
    with pytest.raises(PlannerSizeMismatchError, match="size"):
        fft_64_dit_with_planner(re, im, Direction.Forward, planner)


def test_planner_rejects_non_power_of_two():
    with pytest.raises(NonPowerOfTwoError):
        PlannerDit64(100)


def test_errors_are_value_errors():
    # All phastft errors subclass ValueError so generic handlers work.
    assert issubclass(PhastftError, ValueError)
    assert issubclass(NonPowerOfTwoError, PhastftError)
    assert issubclass(PlannerSizeMismatchError, PhastftError)


def test_direction_chars_accepted():
    # pyphastft bindings accept 'f'/'r' chars (pyphastft/src/lib.rs:36-40)
    re, im = np.ones(8), np.zeros(8)
    fre, _ = fft_64_dit(re, im, "f")
    assert float(fre[0]) == 8.0
    rre, _ = fft_64_dit(re, im, "r")
    assert float(rre[0]) == 1.0  # scaled by 1/N


def test_bad_direction_rejected():
    with pytest.raises(PhastftError, match="direction"):
        fft_64_dit(np.ones(8), np.zeros(8), "x")
    with pytest.raises(PhastftError, match="direction"):
        fft_64_dit(np.ones(8), np.zeros(8), 1)
