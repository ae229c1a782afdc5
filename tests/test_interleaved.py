"""Interleaved-complex API tests.

Mirrors /root/reference/src/lib.rs:340-378 (interleaved vs planar results
match @1e-10) and /root/reference/src/complex_nums.rs:57-101 (deinterleave
on odd/edge lengths, interleave round-trip).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from phastft_tpu import (
    Direction,
    fft_32_interleaved,
    fft_64_dit,
    fft_64_interleaved,
)
from phastft_tpu.ops.complex_interop import combine_re_im, deinterleave, interleave


def test_interleaved_matches_planar_f64():
    n = 1 << 10
    rng = np.random.default_rng(0)
    re = rng.standard_normal(n)
    im = rng.standard_normal(n)
    sig = re + 1j * im
    got = fft_64_interleaved(sig, Direction.Forward)
    pre, pim = fft_64_dit(re, im, Direction.Forward)
    np.testing.assert_allclose(got.real, np.asarray(pre), atol=1e-10)
    np.testing.assert_allclose(got.imag, np.asarray(pim), atol=1e-10)


def test_interleaved_roundtrip_f64():
    n = 1 << 8
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    spec = fft_64_interleaved(sig, Direction.Forward)
    back = fft_64_interleaved(spec, Direction.Reverse)
    np.testing.assert_allclose(back, sig, atol=1e-10)


def test_interleaved_f32():
    n = 1 << 8
    rng = np.random.default_rng(2)
    sig = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    got = fft_32_interleaved(jnp.asarray(sig), Direction.Forward)
    assert got.dtype == np.complex64
    want = np.fft.fft(sig.astype(np.complex128))
    err = np.linalg.norm(np.asarray(got, np.complex128) - want) / np.linalg.norm(want)
    assert err < 1e-5


def test_interleaved_nonpow2_raises():
    from phastft_tpu import NonPowerOfTwoError

    with pytest.raises(NonPowerOfTwoError):
        fft_64_interleaved(np.zeros(100, dtype=complex), Direction.Forward)


def test_deinterleave_complex():
    sig = np.array([1 + 2j, 3 + 4j, 5 + 6j])
    re, im = deinterleave(sig)
    np.testing.assert_array_equal(re, [1, 3, 5])
    np.testing.assert_array_equal(im, [2, 4, 6])


@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, 100, 100500])
def test_deinterleave_flat_odd_lengths(n):
    # chunks_exact(2) semantics: trailing unpaired scalar dropped
    # (complex_nums.rs:57-101, includes length 100500).
    x = np.arange(n, dtype=np.float64)
    re, im = deinterleave(x)
    pairs = n // 2
    np.testing.assert_array_equal(re, x[: 2 * pairs : 2])
    np.testing.assert_array_equal(im, x[1 : 2 * pairs : 2])


def test_interleave_combine_roundtrip():
    rng = np.random.default_rng(3)
    re = rng.standard_normal(64)
    im = rng.standard_normal(64)
    flat = interleave(re, im)
    r2, i2 = deinterleave(flat)
    np.testing.assert_array_equal(r2, re)
    np.testing.assert_array_equal(i2, im)
    c = combine_re_im(re, im)
    np.testing.assert_array_equal(c.real, re)
    np.testing.assert_array_equal(c.imag, im)
