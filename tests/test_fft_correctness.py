"""C2C forward/inverse correctness vs the numpy oracle.

Mirrors the reference's oracle-comparison tests (`test_fft_correctness!`
macro, /root/reference/src/lib.rs:298-338: f32 swept 2^4..2^9, f64 swept
2^4..2^17 against rustfft) and the analytic edge cases. Oracle here is
numpy's FFT in f64.
"""

import numpy as np
import pytest

from phastft_tpu import (
    Direction,
    Options,
    PlannerDit32,
    PlannerDit64,
    fft_32_dit,
    fft_64_dit,
    fft_32_dit_with_planner,
    fft_64_dit_with_planner,
    fft_64_dit_with_planner_and_opts,
)
from phastft_tpu.utils.testing import gen_random_signal_f64, rel_l2_error


@pytest.mark.parametrize("log_n", range(1, 18, 2))
def test_forward_matches_numpy_f64(log_n):
    n = 1 << log_n
    re, im = gen_random_signal_f64(n, seed=log_n)
    want = np.fft.fft(re + 1j * im)
    got_re, got_im = fft_64_dit(re, im, Direction.Forward)
    assert rel_l2_error(got_re, got_im, want) < 1e-12


@pytest.mark.parametrize("log_n", range(4, 10))
def test_forward_matches_numpy_f32(log_n):
    n = 1 << log_n
    re, im = gen_random_signal_f64(n, seed=log_n)
    want = np.fft.fft(re + 1j * im)
    got_re, got_im = fft_32_dit(re.astype(np.float32), im.astype(np.float32),
                                Direction.Forward)
    assert rel_l2_error(got_re, got_im, want) < 1e-5


@pytest.mark.parametrize("log_n", [4, 8, 12, 16])
def test_inverse_matches_numpy_f64(log_n):
    n = 1 << log_n
    re, im = gen_random_signal_f64(n, seed=100 + log_n)
    want = np.fft.ifft(re + 1j * im)
    got_re, got_im = fft_64_dit(re, im, Direction.Reverse)
    assert rel_l2_error(got_re, got_im, want) < 1e-12


def test_ramp_input_matches_numpy():
    # The reference oracle test uses ramp inputs 1..n (src/lib.rs:298-338).
    n = 1 << 10
    re = np.arange(1, n + 1, dtype=np.float64)
    im = np.arange(1, n + 1, dtype=np.float64)
    want = np.fft.fft(re + 1j * im)
    got_re, got_im = fft_64_dit(re, im, Direction.Forward)
    assert rel_l2_error(got_re, got_im, want) < 1e-12


def test_dc_only():
    n = 64
    re, im = np.ones(n), np.zeros(n)
    got_re, got_im = fft_64_dit(re, im, Direction.Forward)
    want = np.zeros(n, dtype=complex)
    want[0] = n
    assert rel_l2_error(got_re, got_im, want) < 1e-14


def test_single_tone():
    n = 128
    k = 5
    t = np.arange(n)
    re = np.cos(2 * np.pi * k * t / n)
    im = np.zeros(n)
    got_re, got_im = fft_64_dit(re, im, Direction.Forward)
    want = np.fft.fft(re)
    assert rel_l2_error(got_re, got_im, want) < 1e-12


def test_planner_paths_agree_bitwise():
    # planner vs convenience must agree bitwise (the reference asserts
    # exact float equality for analogous paths, src/algorithms/r2c.rs:993-996)
    n = 1 << 12
    re, im = gen_random_signal_f64(n)
    a_re, a_im = fft_64_dit(re, im, Direction.Forward)
    p = PlannerDit64(n)
    b_re, b_im = fft_64_dit_with_planner(re, im, Direction.Forward, p)
    np.testing.assert_array_equal(np.asarray(a_re), np.asarray(b_re))
    np.testing.assert_array_equal(np.asarray(a_im), np.asarray(b_im))


@pytest.mark.parametrize("tiled", [False, True])
def test_bitrev_strategies_agree_bitwise(tiled):
    n = 1 << 14
    re, im = gen_random_signal_f64(n)
    p = PlannerDit64(n)
    opts = Options(tiled_bit_reversal=tiled, strategy="staged")
    got_re, got_im = fft_64_dit_with_planner_and_opts(
        re, im, Direction.Forward, p, opts
    )
    want = np.fft.fft(re + 1j * im)
    assert rel_l2_error(got_re, got_im, want) < 1e-12


@pytest.mark.parametrize("log_n", [3, 6, 10, 13, 17])
@pytest.mark.parametrize("direction", [Direction.Forward, Direction.Reverse])
def test_fast_path_matches_staged(log_n, direction):
    # The Stockham/four-step fast path and the reference-shaped staged
    # path must agree (the analog of codelet-vs-staged equivalence,
    # src/kernels/codelets.rs:500-698). 2^17 exercises the four-step split.
    n = 1 << log_n
    re, im = gen_random_signal_f64(n, seed=log_n)
    p = PlannerDit64(n)
    fast = fft_64_dit_with_planner_and_opts(
        re, im, direction, p, Options(strategy="auto")
    )
    staged = fft_64_dit_with_planner_and_opts(
        re, im, direction, p, Options(strategy="staged")
    )
    np.testing.assert_allclose(
        np.asarray(fast[0]), np.asarray(staged[0]), atol=1e-11, rtol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(fast[1]), np.asarray(staged[1]), atol=1e-11, rtol=1e-11
    )


def test_batched_matches_loop():
    n = 1 << 8
    batch = 4
    rng = np.random.default_rng(7)
    re = rng.standard_normal((batch, n))
    im = rng.standard_normal((batch, n))
    got_re, got_im = fft_64_dit(re, im, Direction.Forward)
    for b in range(batch):
        want = np.fft.fft(re[b] + 1j * im[b])
        assert rel_l2_error(got_re[b], got_im[b], want) < 1e-12


def test_f32_planner_reuse():
    n = 1 << 9
    p = PlannerDit32(n)
    re, im = gen_random_signal_f64(n)
    got_re, got_im = fft_32_dit_with_planner(
        re.astype(np.float32), im.astype(np.float32), Direction.Forward, p
    )
    want = np.fft.fft(re.astype(np.float32) + 1j * im.astype(np.float32))
    assert rel_l2_error(got_re, got_im, want) < 1e-5
