"""Unit tests for the Stockham/four-step fast path internals.

The role the codelet-equivalence tests play in the reference
(/root/reference/src/kernels/codelets.rs:500-698): the fused fast kernels
must agree with the plain oracle at every size class (tiny, leaf, split).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phastft_tpu.ops.fourstep import (
    fft_rows,
    leaf_sizes,
    max_table_size,
    plan_rows,
)
from phastft_tpu.ops.stockham import (
    LANES,
    leaf_correction_host,
    radix_tables_host,
    stockham_axis2,
)


def _tables(max_m, dtype):
    host = radix_tables_host(max_m, np.dtype(dtype).name)
    return {
        m: tuple((jnp.asarray(a), jnp.asarray(b)) for a, b in entry)
        for m, entry in host.items()
    }


def _corrs(plan, dtype):
    out = {}
    for n1 in leaf_sizes(plan):
        cre, cim = leaf_correction_host(n1, LANES, np.dtype(dtype).name)
        out[f"leaf{n1}"] = (jnp.asarray(cre), jnp.asarray(cim))
    return out


@pytest.mark.parametrize("m", [2, 4, 8, 16, 64, 256, 1024])
def test_stockham_axis2_matches_numpy(m):
    rng = np.random.default_rng(m)
    x = rng.standard_normal((m, 8)) + 1j * rng.standard_normal((m, 8))
    tables = _tables(m, np.float64)
    re, im = stockham_axis2(
        jnp.asarray(x.real), jnp.asarray(x.imag), tables, m
    )
    want = np.fft.fft(x, axis=0)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-13


@pytest.mark.parametrize("log_n", list(range(0, 19)) + [20])
def test_fft_rows_all_size_classes(log_n):
    n = 1 << log_n
    plan = plan_rows(n, 1 << 16)
    rng = np.random.default_rng(log_n)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    tables = _tables(max_table_size(plan), np.float64)
    corrs = _corrs(plan, np.float64)
    re, im = jax.jit(
        lambda r, i: fft_rows(r, i, plan, tables, corrs)
    )(jnp.asarray(x.real), jnp.asarray(x.imag))
    want = np.fft.fft(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


def test_plan_structure():
    assert plan_rows(64, 1 << 16) == ("tiny", 64)
    assert plan_rows(1 << 14, 1 << 16) == ("leaf", (1 << 14) // 128)
    p = plan_rows(1 << 20, 1 << 16)
    assert p[0] == "split" and p[1] == 1 << 4 and p[3] == 1 << 16
    p27 = plan_rows(1 << 27, 1 << 16)
    assert p27[0] == "split" and p27[1] == 1 << 11  # single level to 2^27
    assert p27[2] == ("leaf", (1 << 16) // 128)
    # past the fused column kernel's n1 ceiling the plan nests another
    # split level sized so the inner transform is leaf * 128 — its
    # column factor is then exactly 128, the smallest factor the fused
    # two-pass (transposed-write leaf) pipeline accepts
    p30 = plan_rows(1 << 30, 1 << 16)
    assert p30[0] == "split" and p30[1] == 1 << 7
    inner = p30[2]
    assert inner[0] == "split" and inner[1] == 1 << 7
    assert inner[2] == ("leaf", (1 << 16) // 128)


def test_fft_rows_nested_split_matches_numpy():
    """A plan with two split levels (forced via a small leaf limit) — the
    2^28+ structure — stays exact through the recursion."""
    n = 1 << 18
    leaf = 1 << 6
    plan = plan_rows(n, leaf)
    assert plan[0] == "split" and plan[2][0] == "split"
    rng = np.random.default_rng(18)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    tables = _tables(max_table_size(plan), np.float64)
    corrs = _corrs(plan, np.float64)
    re, im = jax.jit(
        lambda r, i: fft_rows(r, i, plan, tables, corrs)
    )(jnp.asarray(x.real), jnp.asarray(x.imag))
    want = np.fft.fft(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


def test_fft_rows_batched_chunked():
    # batch large enough to trigger the chunked scan path
    n = 1 << 10
    b = 64
    rng = np.random.default_rng(5)
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    plan = plan_rows(n, 1 << 16)
    tables = _tables(max_table_size(plan), np.float64)
    corrs = _corrs(plan, np.float64)
    re, im = jax.jit(
        lambda r, i: fft_rows(r, i, plan, tables, corrs)
    )(jnp.asarray(x.real), jnp.asarray(x.imag))
    want = np.fft.fft(x, axis=-1)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


def test_fft_rows_f32():
    n = 1 << 17  # split path in f32
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    plan = plan_rows(n, 1 << 16)
    tables = _tables(max_table_size(plan), np.float32)
    corrs = _corrs(plan, np.float32)
    re, im = jax.jit(
        lambda r, i: fft_rows(r, i, plan, tables, corrs)
    )(jnp.asarray(x.real), jnp.asarray(x.imag))
    want = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 2e-6
