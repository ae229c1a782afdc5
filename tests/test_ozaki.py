"""Tests for the Ozaki bf16-slice dd engine (ops/ozaki.py +
ops/pallas_ozdd.py).

The slice contraction itself is plain jnp, so its dd-grade accuracy
(~1e-11) is asserted directly on CPU. The fused kernels run under the
Mosaic interpreter, whose f32 op semantics may contract or reorder
(see tests/test_pallas_dd.py) — interpret-mode runs are only checked to
~1e-6, enough to catch wiring/layout bugs; dd-grade accuracy on real
hardware is asserted by the driver bench (BENCH artifacts).
"""

import functools

import numpy as np
import pytest


def _dd(hi, lo):
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def test_oz_cmatmul_dd_accuracy():
    import jax
    import jax.numpy as jnp

    from phastft_tpu.ops.df64 import split_hi_lo
    from phastft_tpu.ops.ozaki import oz_cmatmul_dd, oz_slice_matrix_host

    rng = np.random.default_rng(0)
    d, c = 128, 256
    ang = -2 * np.pi * np.outer(np.arange(d), np.arange(d)) / d
    fr64, fi64 = np.cos(ang), np.sin(ang)
    fr = oz_slice_matrix_host(fr64)
    fi = oz_slice_matrix_host(fi64)
    fs = oz_slice_matrix_host(fr64 + fi64, bound=2.0)
    # wide dynamic range: per-column scaling must hold up
    xr64 = rng.standard_normal((d, c)) * np.exp(rng.standard_normal((d, c)))
    xi64 = rng.standard_normal((d, c))
    xr = tuple(jnp.asarray(a) for a in split_hi_lo(xr64))
    xi = tuple(jnp.asarray(a) for a in split_hi_lo(xi64))
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    reh, rel, imh, iml = oz_cmatmul_dd(fr, fi, fs, xr, xi, dot, axis=0)
    got = _dd(reh, rel) + 1j * _dd(imh, iml)
    want = (fr64 + 1j * fi64) @ (xr64 + 1j * xi64)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-9, err


def test_oz_sigma_exact_powers():
    import jax.numpy as jnp

    from phastft_tpu.ops.ozaki import oz_sigma

    m = jnp.asarray(
        [0.0, 1e-30, 0.75, 1.0, 1.5, 2.0, 1e20], jnp.float32
    )
    sigma, inv = oz_sigma(m)
    s = np.asarray(sigma, np.float64)
    i = np.asarray(inv, np.float64)
    # exact reciprocals, powers of two, sigma > maxabs
    np.testing.assert_array_equal(s * i, np.ones_like(s))
    assert np.all(s > np.asarray(m)), (s, np.asarray(m))
    assert np.all(np.log2(s) == np.round(np.log2(s)))


@pytest.mark.parametrize("n1,n2", [(128, 1024), (256, 1024)])
def test_oz_fused_two_pass_interpret(n1, n2):
    """ozcol -> ozleaft == FFT, under the Mosaic interpreter (loose
    1e-6 gate: the interpreter's op reordering breaks TwoSum exactness;
    hardware runs hold ~1e-11 — see module docstring)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from phastft_tpu.ops.df64 import split_hi_lo
    from phastft_tpu.ops.pallas_ozdd import (
        ozcol_pallas,
        ozcol_tables_host,
        ozleaft_pallas,
        ozleaft_tables_host,
    )

    rng = np.random.default_rng(n1)
    n = n1 * n2
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    arrs = [
        jnp.asarray(a).reshape(n1, n2)
        for pair in (split_hi_lo(x.real), split_hi_lo(x.imag))
        for a in pair
    ]
    ctabs = tuple(jnp.asarray(a) for a in ozcol_tables_host(n1, n2))
    ltabs = tuple(jnp.asarray(a) for a in ozleaft_tables_host(n2))
    with pltpu.force_tpu_interpret_mode():
        c = ozcol_pallas(*arrs, ctabs, n1)
        assert c is not None
        out = ozleaft_pallas(*c, ltabs, n1)
        assert out is not None
    got = _dd(out[0], out[1]) + 1j * _dd(out[2], out[3])
    want = np.fft.fft(x)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-6, err


def test_fft_rows_dd_oz_dispatch(monkeypatch):
    """With df64-oz options the planner builds the oz tables and
    fft_rows_dd routes through the oz kernels (mocked)."""
    import jax.numpy as jnp

    from phastft_tpu.options import Options
    from phastft_tpu.ops import fourstep
    from phastft_tpu.planner import PlannerDit64

    n = 1 << 17  # split(16? no): leaf 2^10 -> n1 = 128, n2 = 1024
    p = PlannerDit64(
        n, options=Options(leaf_fft_size=1 << 10, f64_engine="df64-oz")
    )
    tables, corrs = p.dd_state
    assert "ozcol128x1024" in corrs and "ozleafT1024" in corrs
    calls = []
    monkeypatch.setattr(fourstep, "pallas_available", lambda: True)

    import phastft_tpu.ops.pallas_dd as pallas_dd
    import phastft_tpu.ops.pallas_ozdd as ozdd

    monkeypatch.setattr(
        ozdd, "ozcol_pallas", lambda *a, **k: calls.append("ozcol") or None
    )
    # the decline falls through to the dd column kernel — mock it too
    # (real Pallas cannot lower on the CPU backend)
    monkeypatch.setattr(
        pallas_dd, "ddcol_pallas",
        lambda *a, **k: calls.append("ddcol") or None,
    )
    z = jnp.zeros((n,), jnp.float32)
    fourstep.fft_rows_dd(z, z, z, z, p.plan, tables, corrs)
    assert calls and calls[0] == "ozcol"

