"""Radix-4/2 Stockham autosort FFT, laid out for the TPU VPU.

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

Radix 4 is used for all steps (with one radix-2 cleanup for odd log2),
halving the number of materialized intermediates vs radix 2 — the same
reason the reference's codelets fuse 4 stages (codelets.rs:30-32).

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
    "radix_tables_host",
    "stockham_axis2",
    "leaf_correction_host",
    "leaf_fft",
    "tiny_fft",
]

LANES = 128


@functools.lru_cache(maxsize=64)
def radix_tables_host(max_m: int, dtype_name: str):
    """Host twiddle tables for radix-4 Stockham steps of every power-of-2
    length m in [4, max_m]: (W_m^p, W_m^2p, W_m^3p) for p < m/4.

    Computed from exact angles in f64 and cast once (the reference's
    drift-avoidance contract, src/planner.rs:148-159)."""
    dtype = np.dtype(dtype_name)
    tables = {}
    m = 4
    while m <= max_m:
        p = np.arange(m // 4, dtype=np.float64)
        entry = []
        for j in (1, 2, 3):
            ang = -2.0 * np.pi * j * p / m
            entry.append(
                (np.cos(ang).astype(dtype), np.sin(ang).astype(dtype))
            )
        tables[m] = tuple(entry)
        m *= 2
    return tables


def stockham_axis2(re, im, tables, m: int):
    """DFT along axis -2 of (..., m, L) planar arrays. ``tables`` maps step
    length -> three (wre, wim) pairs (from the planner; device arrays).

    Normal-order in, normal-order out (autosort); no scaling."""
    batch = re.shape[:-2]
    lanes = re.shape[-1]
    r = 1
    re = re.reshape(batch + (m, 1, lanes))
    im = im.reshape(batch + (m, 1, lanes))
    cur = m
    while cur >= 4:
        q = cur // 4
        (w1r, w1i), (w2r, w2i), (w3r, w3i) = tables[cur]
        shape_w = (q, 1, 1)
        w1r, w1i = w1r.reshape(shape_w), w1i.reshape(shape_w)
        w2r, w2i = w2r.reshape(shape_w), w2i.reshape(shape_w)
        w3r, w3i = w3r.reshape(shape_w), w3i.reshape(shape_w)
        a0r, a1r, a2r, a3r = (
            re[..., i * q : (i + 1) * q, :, :] for i in range(4)
        )
        a0i, a1i, a2i, a3i = (
            im[..., i * q : (i + 1) * q, :, :] for i in range(4)
        )
        # radix-4 DIF butterfly (W = W_cur):
        #   X[4k+0] <- a0+a1+a2+a3
        #   X[4k+1] <- W^p  * (a0 - i a1 - a2 + i a3)
        #   X[4k+2] <- W^2p * (a0 -   a1 + a2 -   a3)
        #   X[4k+3] <- W^3p * (a0 + i a1 - a2 - i a3)
        b0r, b0i = a0r + a2r, a0i + a2i
        b1r, b1i = a1r + a3r, a1i + a3i
        b2r, b2i = a0r - a2r, a0i - a2i
        b3r, b3i = a1r - a3r, a1i - a3i
        y0r, y0i = b0r + b1r, b0i + b1i
        t2r, t2i = b0r - b1r, b0i - b1i
        t1r, t1i = b2r + b3i, b2i - b3r  # b2 - i*b3
        t3r, t3i = b2r - b3i, b2i + b3r  # b2 + i*b3
        y1r = t1r * w1r - t1i * w1i
        y1i = t1r * w1i + t1i * w1r
        y2r = t2r * w2r - t2i * w2i
        y2i = t2r * w2i + t2i * w2r
        y3r = t3r * w3r - t3i * w3i
        y3i = t3r * w3i + t3i * w3r
        re = jnp.stack([y0r, y1r, y2r, y3r], axis=-3).reshape(
            batch + (q, 4 * r, lanes)
        )
        im = jnp.stack([y0i, y1i, y2i, y3i], axis=-3).reshape(
            batch + (q, 4 * r, lanes)
        )
        cur //= 4
        r *= 4
    if cur == 2:
        # radix-2 cleanup for odd log2(m); W_2^0 = 1, no twiddle needed.
        ar, br = re[..., :1, :, :], re[..., 1:, :, :]
        ai, bi = im[..., :1, :, :], im[..., 1:, :, :]
        re = jnp.stack([ar + br, ar - br], axis=-3).reshape(
            batch + (1, 2 * r, lanes)
        )
        im = jnp.stack([ai + bi, ai - bi], axis=-3).reshape(
            batch + (1, 2 * r, lanes)
        )
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
