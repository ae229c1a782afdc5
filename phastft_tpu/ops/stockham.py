"""High-radix Stockham autosort FFT, laid out for the TPU VPU.

This is the performance core of the framework — the TPU-native re-design of
the reference's fused codelets + per-stage kernels
(/root/reference/src/kernels/codelets.rs, src/kernels/dit.rs). The design
maps the reference's two key insights onto XLA:

* The reference fuses the low stages into register-resident codelets
  because they are memory-bound (codelets.rs:24-32). Here *every* stage is
  expressed so the innermost (lane) axis stays contiguous and >= 128 wide:
  the transform runs along axis -2 (sublanes) of a (..., m, r, L) view, so
  each butterfly is a full-width VPU op and XLA fuses the whole stage into
  one kernel. Early DIT stages with tiny pair distance — the part that
  kills (8,128) tiling — never occur: distance is always measured in
  sublane rows.

* The reference bit-reverses up front (CO-BRAVO) to keep butterflies
  in-order. Stockham autosorting achieves normal-order output with *no*
  permutation pass at all: each DIF step extracts one output digit and
  re-stacks it as a batch axis, so ordering emerges from reshapes that XLA
  lowers to cheap sublane moves. (The explicit bit-reversal op remains in
  ops/bitrev.py for the staged path and as a public component.)

Each step uses radix 16 where possible (smaller cleanup radix for the
remainder of log2(m)): the size-16 DFT runs entirely in vector registers
via a recursive split-radix expansion with *constant* internal twiddles
(`_dft_regs`), so one HBM pass retires four radix-2 stages — the same
"register-resident codelet" economics as the reference's fused FFT-16
kernel (codelets.rs:24-210), but with the pass structure chosen for HBM
instead of L1. Measured on v5e at 2^24 f64, radix-16 is ~1.4x radix-4
(fewer passes *and* fewer emulated-f64 twiddle multiplies per element).

A length-n row FFT is decomposed as n = n1 * 128: column FFTs of size n1
(along sublanes), twiddle correction W_n^{k1*i2}, a (n1,128) transpose,
column FFTs of size 128. Output lands in natural order by construction
(X[k1 + k2*n1] = second-FFT output read transposed).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "LANES",
    "DEFAULT_RADIX",
    "radix_schedule",
    "radix_tables_host",
    "stockham_axis2",
    "leaf_correction_host",
    "leaf_fft",
    "tiny_fft",
]

LANES = 128

#: Largest radix used for a single Stockham step. 16 = four radix-2 stages
#: per HBM pass; past 16 the register (vector-temp) footprint of the
#: in-register DFT outgrows what Mosaic/XLA schedules well.
DEFAULT_RADIX = 16


def radix_schedule(m: int, max_radix: int = DEFAULT_RADIX) -> tuple:
    """Greedy largest-first radix factorization of power-of-2 ``m``."""
    out = []
    lm = m.bit_length() - 1
    lr = max_radix.bit_length() - 1
    while lm > 0:
        k = min(lm, lr)
        out.append(1 << k)
        lm -= k
    return tuple(out)


def _dft_regs(pairs):
    """DFT across a list of 2^k (re, im) array pairs, fully unrolled with
    constant twiddles (recursive natural-order Cooley-Tukey).

    The TPU analog of the reference's register-resident codelet bodies
    (codelets.rs:34-210): every intermediate is a vector temp inside one
    XLA fusion; w = 1, ±i and the |c|=|s| diagonals are special-cased to
    minimize (emulated-f64) multiplies."""
    m = len(pairs)
    if m == 1:
        return pairs
    ev = _dft_regs(pairs[0::2])
    od = _dft_regs(pairs[1::2])
    out = [None] * m
    for j in range(m // 2):
        er, ei = ev[j]
        orr, oi = od[j]
        ang = -2.0 * np.pi * j / m
        c, s = float(np.cos(ang)), float(np.sin(ang))
        if j == 0:  # w = 1
            tr, ti = orr, oi
        elif 4 * j == m:  # w = -i
            tr, ti = oi, -orr
        elif abs(abs(c) - abs(s)) < 1e-15:  # w = c*(1 ± i): two muls
            if s * c < 0:  # w = c*(1 - i)   (ang = -pi/4)
                tr, ti = c * (orr + oi), c * (oi - orr)
            else:  # w = c*(1 + i), c < 0    (ang = -3*pi/4)
                tr, ti = c * (orr - oi), c * (oi + orr)
        else:
            tr = orr * c - oi * s
            ti = orr * s + oi * c
        out[j] = (er + tr, ei + ti)
        out[j + m // 2] = (er - tr, ei - ti)
    return out


@functools.lru_cache(maxsize=64)
def radix_tables_host(max_m: int, dtype_name: str,
                      max_radix: int = DEFAULT_RADIX):
    """Host twiddle tables for the Stockham steps of every power-of-2
    length m <= max_m: key (cur, R) -> tuple of (W_cur^{j*p}, p < cur/R)
    pairs for j in 1..R-1. Steps with cur == R need no table (p = 0 only).

    Computed from exact angles in f64 and cast once (the reference's
    drift-avoidance contract, src/planner.rs:148-159)."""
    dtype = np.dtype(dtype_name)
    tables = {}
    m = 2
    while m <= max_m:
        cur = m
        for R in radix_schedule(m, max_radix):
            q = cur // R
            if q > 1 and (cur, R) not in tables:
                p = np.arange(q, dtype=np.float64)
                entry = []
                for j in range(1, R):
                    ang = -2.0 * np.pi * j * p / cur
                    entry.append(
                        (
                            np.cos(ang).reshape(q, 1, 1).astype(dtype),
                            np.sin(ang).reshape(q, 1, 1).astype(dtype),
                        )
                    )
                tables[(cur, R)] = tuple(entry)
            cur //= R
        m *= 2
    return tables


def stockham_axis2(re, im, tables, m: int, max_radix: int = DEFAULT_RADIX):
    """DFT along axis -2 of (..., m, L) planar arrays. ``tables`` maps
    (step length, radix) -> per-digit twiddle pairs (from the planner;
    device arrays shaped (q, 1, 1)).

    Normal-order in, normal-order out (autosort); no scaling. One XLA
    fusion (one HBM pass) per radix-R step: slice R contiguous blocks,
    in-register DFT-R, per-digit twiddle multiply, restack."""
    batch = re.shape[:-2]
    lanes = re.shape[-1]
    r = 1
    re = re.reshape(batch + (m, 1, lanes))
    im = im.reshape(batch + (m, 1, lanes))
    cur = m
    for R in radix_schedule(m, max_radix):
        q = cur // R
        xs = [
            (
                re[..., j * q : (j + 1) * q, :, :],
                im[..., j * q : (j + 1) * q, :, :],
            )
            for j in range(R)
        ]
        ys = _dft_regs(xs)
        outs_r, outs_i = [ys[0][0]], [ys[0][1]]
        if q == 1:
            for j in range(1, R):
                outs_r.append(ys[j][0])
                outs_i.append(ys[j][1])
        else:
            entry = tables[(cur, R)]
            for j in range(1, R):
                wr, wi = entry[j - 1]
                yr, yi = ys[j]
                outs_r.append(yr * wr - yi * wi)
                outs_i.append(yr * wi + yi * wr)
        re = jnp.stack(outs_r, axis=-3).reshape(batch + (q, R * r, lanes))
        im = jnp.stack(outs_i, axis=-3).reshape(batch + (q, R * r, lanes))
        cur //= R
        r *= R
    return re.reshape(batch + (m, lanes)), im.reshape(batch + (m, lanes))


@functools.lru_cache(maxsize=32)
def split_correction_host(n1: int, n2: int, dtype_name: str):
    """Factored split-correction tables for W_n^(k1*i2), n = n1*n2.

    With i2 = a*S + b (S ~ sqrt(n2)): W_n^(k1*i2) = T1[k1,a] * T2[k1,b],
    T1[k1,a] = W_n^(k1*a*S) (n1, n2/S), T2[k1,b] = W_n^(k1*b) (n1, S).
    Memory is O(n1*sqrt(n2)) instead of O(n), and the two fused complex
    multiplies are far cheaper than on-the-fly f64 sin/cos (emulated
    transcendentals dominate otherwise). Both tables from exact f64
    angles, one product rounding — within the reference's twiddle
    accuracy contract (src/planner.rs:148-159)."""
    dtype = np.dtype(dtype_name)
    n = n1 * n2
    s = 1 << ((n2.bit_length() - 1) // 2)
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    a = np.arange(n2 // s, dtype=np.float64)[None, :]
    b = np.arange(s, dtype=np.float64)[None, :]
    ang1 = (-2.0 * np.pi / n) * (k1 * (a * s))
    ang2 = (-2.0 * np.pi / n) * (k1 * b)
    return (
        s,
        np.cos(ang1).astype(dtype),
        np.sin(ang1).astype(dtype),
        np.cos(ang2).astype(dtype),
        np.sin(ang2).astype(dtype),
    )


@functools.lru_cache(maxsize=64)
def leaf_correction_host(n1: int, lanes: int, dtype_name: str):
    """Host (n1, lanes) twiddle-correction table W_n^(k1*i2), n = n1*lanes."""
    from .. import native

    dtype = np.dtype(dtype_name)
    got = (
        native.correction_table(n1, lanes, dtype)
        if n1 * lanes >= (1 << 16)
        else None
    )
    if got is not None:
        return got
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    i2 = np.arange(lanes, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * (k1 * i2) / float(n1 * lanes)
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def leaf_fft(re, im, tables, corr_re, corr_im, n1: int):
    """DFT along the last axis of (..., n), n = n1 * LANES, fully in one
    fused XLA region: column FFTs + correction + transpose + column FFTs."""
    batch = re.shape[:-1]
    re = re.reshape(batch + (n1, LANES))
    im = im.reshape(batch + (n1, LANES))
    if n1 > 1:
        re, im = stockham_axis2(re, im, tables, n1)
        tr = re * corr_re - im * corr_im
        ti = re * corr_im + im * corr_re
    else:
        tr, ti = re, im
    tr = jnp.swapaxes(tr, -1, -2)
    ti = jnp.swapaxes(ti, -1, -2)
    tr, ti = stockham_axis2(tr, ti, tables, LANES)
    return tr.reshape(batch + (n1 * LANES,)), ti.reshape(batch + (n1 * LANES,))


def tiny_fft(re, im, tables, n: int):
    """DFT along the last axis for n < LANES (single Stockham pass with the
    batch dim, if any, as lanes)."""
    if n == 1:
        return re, im
    batch = re.shape[:-1]
    re, im = stockham_axis2(
        re.reshape(batch + (n, 1)), im.reshape(batch + (n, 1)), tables, n
    )
    return re.reshape(batch + (n,)), im.reshape(batch + (n,))
