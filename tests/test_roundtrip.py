"""Round-trip tests: IFFT(FFT(x)) == x under 1/N scaling.

Mirrors /root/reference/src/lib.rs:380-425 (f64 @ 1e-10, f32 @ 1e-7 on
unit-norm random signals) and the Tune-mode variant (src/lib.rs:438-461).
"""

import numpy as np
import pytest

from phastft_tpu import (
    Direction,
    PlannerDit64,
    PlannerMode,
    fft_32_dit,
    fft_64_dit,
    fft_64_dit_with_planner,
)
from phastft_tpu.utils.testing import (
    assert_float_closeness,
    gen_random_signal_f32,
    gen_random_signal_f64,
)


@pytest.mark.parametrize("log_n", range(1, 17))
def test_roundtrip_f64(log_n):
    n = 1 << log_n
    re, im = gen_random_signal_f64(n, seed=log_n)
    fre, fim = fft_64_dit(re, im, Direction.Forward)
    rre, rim = fft_64_dit(fre, fim, Direction.Reverse)
    assert_float_closeness(np.asarray(rre), re, 1e-10)
    assert_float_closeness(np.asarray(rim), im, 1e-10)


@pytest.mark.parametrize("log_n", range(1, 14))
def test_roundtrip_f32(log_n):
    n = 1 << log_n
    re, im = gen_random_signal_f32(n, seed=log_n)
    fre, fim = fft_32_dit(re, im, Direction.Forward)
    rre, rim = fft_32_dit(fre, fim, Direction.Reverse)
    assert_float_closeness(np.asarray(rre), re, 1e-6)
    assert_float_closeness(np.asarray(rim), im, 1e-6)


@pytest.mark.slow
def test_roundtrip_with_tune_mode_planner():
    # PlannerMode::Tune accepted, currently equivalent to Heuristic
    # (src/planner.rs:65; pinned by benches/planner_mode.rs).
    n = 1 << 10
    planner = PlannerDit64.with_mode(n, PlannerMode.Tune)
    re, im = gen_random_signal_f64(n)
    fre, fim = fft_64_dit_with_planner(re, im, Direction.Forward, planner)
    rre, rim = fft_64_dit_with_planner(fre, fim, Direction.Reverse, planner)
    assert_float_closeness(np.asarray(rre), re, 1e-10)
    assert_float_closeness(np.asarray(rim), im, 1e-10)


def test_only_inverse_scales():
    # Forward must NOT scale; inverse scales by exactly 1/N
    # (README.md:169-172, src/algorithms/dit.rs:325-331).
    n = 8
    re = np.ones(n)
    im = np.zeros(n)
    fre, fim = fft_64_dit(re, im, Direction.Forward)
    assert float(fre[0]) == float(n)  # unscaled DC bin
    rre, rim = fft_64_dit(np.asarray(fre), np.asarray(fim), Direction.Reverse)
    assert_float_closeness(np.asarray(rre), re, 1e-12)
