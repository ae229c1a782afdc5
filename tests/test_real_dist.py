"""Distributed R2C/C2R tests on the 8-virtual-CPU-device mesh.

The reference has no distributed component at all (SURVEY §2 #14); the
distributed real transforms compose its half-length trick
(/root/reference/src/algorithms/r2c.rs:1-38) with the sharded four-step.
"""

import jax
import numpy as np
import pytest

from phastft_tpu import PlannerR2c32, PlannerR2c64
from phastft_tpu.parallel import (
    c2r_fft_distributed,
    default_mesh,
    r2c_fft_distributed,
)

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs8
@pytest.mark.parametrize("log_n", [12, 16])
def test_r2c_distributed_matches_numpy(log_n):
    n = 1 << log_n
    rng = np.random.default_rng(log_n)
    x = rng.standard_normal(n)
    p = PlannerR2c64(n)
    sre, sim = r2c_fft_distributed(x, p)
    got = np.asarray(sre) + 1j * np.asarray(sim)
    want = np.fft.rfft(x)
    assert got.shape == (n // 2 + 1,)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12
    # DC and Nyquist purely real (r2c.rs:1308-1319 contract)
    assert abs(float(sim[0])) < 1e-12
    assert abs(float(sim[-1])) < 1e-12


@needs8
def test_c2r_distributed_roundtrip():
    n = 1 << 14
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n)
    p = PlannerR2c64(n)
    sre, sim = r2c_fft_distributed(x, p)
    back = c2r_fft_distributed(np.asarray(sre), np.asarray(sim), p)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-10)


@needs8
def test_c2r_distributed_matches_numpy_irfft():
    n = 1 << 12
    rng = np.random.default_rng(3)
    spec = np.fft.rfft(rng.standard_normal(n))
    p = PlannerR2c64(n)
    got = np.asarray(c2r_fft_distributed(spec.real, spec.imag, p))
    want = np.fft.irfft(spec)
    np.testing.assert_allclose(got, want, atol=1e-10)


@needs8
def test_r2c_distributed_f32():
    n = 1 << 12
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n).astype(np.float32)
    p = PlannerR2c32(n)
    sre, sim = r2c_fft_distributed(x, p)
    got = np.asarray(sre, np.float64) + 1j * np.asarray(sim, np.float64)
    want = np.fft.rfft(x.astype(np.float64))
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


@needs8
def test_r2c_distributed_submesh():
    mesh = default_mesh("x", devices=jax.devices()[:4])
    n = 1 << 12
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n)
    p = PlannerR2c64(n)
    sre, sim = r2c_fft_distributed(x, p, mesh=mesh)
    got = np.asarray(sre) + 1j * np.asarray(sim)
    want = np.fft.rfft(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12
