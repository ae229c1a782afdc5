"""Bit-reversal permutation correctness.

Mirrors the reference's permutation tests: BRAVO/COBRAVO vs a naive
recursive even/odd split, exact equality, over a log-size sweep
(/root/reference/src/algorithms/bravo.rs:347-408).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from phastft_tpu.ops.bitrev import (
    apply_bit_reversal,
    bit_reverse_indices,
    naive_bit_reversal,
)


@pytest.mark.parametrize("log_n", range(1, 18))
def test_indices_match_naive_recursive_split(log_n):
    n = 1 << log_n
    x = np.arange(n, dtype=np.float64)
    want = naive_bit_reversal(x)
    got = x[bit_reverse_indices(n)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("log_n", range(1, 18))
@pytest.mark.parametrize("tiled", [False, True])
def test_apply_bit_reversal_exact(log_n, tiled):
    n = 1 << log_n
    x = np.arange(n, dtype=np.float64)
    want = naive_bit_reversal(x)
    got = np.asarray(apply_bit_reversal(jnp.asarray(x), n, tiled))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("tiled", [False, True])
def test_apply_bit_reversal_batched(tiled):
    n = 1 << 10
    x = np.arange(3 * n, dtype=np.float32).reshape(3, n)
    got = np.asarray(apply_bit_reversal(jnp.asarray(x), n, tiled))
    for b in range(3):
        np.testing.assert_array_equal(got[b], naive_bit_reversal(x[b]))


def test_involution():
    # bit reversal is its own inverse
    n = 1 << 12
    idx = bit_reverse_indices(n)
    np.testing.assert_array_equal(idx[idx], np.arange(n))
