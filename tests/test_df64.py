"""Tests for the double-float (df64) f64 engine (ops/df64.py).

Checks the dd primitives are error-free on this backend and the engine
meets the same numerical contracts as the native path (forward vs numpy
oracle, roundtrip under 1/N, only-inverse-scales)."""

import numpy as np
import pytest

from phastft_tpu import Direction, PlannerDit64
from phastft_tpu.fft import fft_64_dit_with_planner_and_opts
from phastft_tpu.options import Options
from phastft_tpu.ops.df64 import join_hi_lo, split_hi_lo

DD = Options(f64_engine="df64")


def test_split_join_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1024) * np.exp(rng.uniform(-20, 20, 1024))
    hi, lo = split_hi_lo(x)
    back = join_hi_lo(hi, lo)
    assert np.abs((back - x) / x).max() < 2**-46


def test_dd_primitives_error_free():
    import jax.numpy as jnp

    from phastft_tpu.ops.df64 import _two_prod, _two_sum

    rng = np.random.default_rng(1)
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)
    s, e = _two_sum(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) + b.astype(np.float64)
    assert np.abs(np.asarray(s, np.float64) + np.asarray(e, np.float64)
                  - exact).max() == 0.0
    p, e2 = _two_prod(jnp.asarray(a), jnp.asarray(b))
    exactp = a.astype(np.float64) * b.astype(np.float64)
    assert np.abs(np.asarray(p, np.float64) + np.asarray(e2, np.float64)
                  - exactp).max() == 0.0


@pytest.mark.parametrize(
    "log_n",
    [2, 5, 7, 10,
     pytest.param(13, marks=pytest.mark.slow),
     pytest.param(17, marks=pytest.mark.slow)],
)
def test_df64_matches_numpy(log_n):
    n = 1 << log_n
    planner = PlannerDit64(n)
    rng = np.random.default_rng(log_n)
    re = rng.standard_normal(n)
    im = rng.standard_normal(n)
    fre, fim = fft_64_dit_with_planner_and_opts(
        re, im, Direction.Forward, planner, DD
    )
    got = np.asarray(fre) + 1j * np.asarray(fim)
    want = np.fft.fft(re + 1j * im)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-12, err


@pytest.mark.slow
def test_df64_roundtrip_and_scaling():
    n = 1 << 12
    planner = PlannerDit64(n)
    rng = np.random.default_rng(2)
    re = rng.standard_normal(n)
    im = rng.standard_normal(n)
    fre, fim = fft_64_dit_with_planner_and_opts(
        re, im, Direction.Forward, planner, DD
    )
    # forward unscaled: DC bin equals the plain sum
    assert abs(float(fre[0]) - re.sum()) < 1e-9
    rre, rim = fft_64_dit_with_planner_and_opts(
        np.asarray(fre), np.asarray(fim), Direction.Reverse, planner, DD
    )
    np.testing.assert_allclose(np.asarray(rre), re, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rim), im, atol=1e-10)


@pytest.mark.slow
def test_df64_matches_native_engine():
    n = 1 << 11
    planner = PlannerDit64(n)
    rng = np.random.default_rng(3)
    re = rng.standard_normal(n)
    im = rng.standard_normal(n)
    ddr, ddi = fft_64_dit_with_planner_and_opts(
        re, im, Direction.Forward, planner, DD
    )
    nr, ni = fft_64_dit_with_planner_and_opts(
        re, im, Direction.Forward, planner, Options()
    )
    np.testing.assert_allclose(np.asarray(ddr), np.asarray(nr), atol=1e-11)
    np.testing.assert_allclose(np.asarray(ddi), np.asarray(ni), atol=1e-11)
