"""Double-float (df64) engine: f64-class FFTs from paired-f32 arithmetic.

TPU v5e has no f64 hardware; XLA emulates every f64 op in software. This
module implements the same emulation idea directly — each logical f64
value is an unevaluated sum hi + lo of two f32s (~48-bit significand) —
specialized for the FFT's needs. Measured end-to-end on v5e at 2^24
(round 2): 26.8 ms vs 30.9 ms for the native-f64 path (1.15x), with the
fused Pallas dd column kernel (ops/pallas_dd.py) carrying the win; the
engine is VPU-throughput-bound, so the margin is structural (fewer HBM
passes), not arithmetic. HBM traffic is identical (hi+lo f32 = 8 bytes
= one f64):

* error-free transforms verified on this VPU: TwoSum is exact, and
  Dekker TwoProd (split constant 4097 = 2^12 + 1) is exact because the
  compiler does not contract a*b - p into an FMA (measured residual 0);
* butterfly adds/subs use the exact TwoSum + low-order fold, multiplies
  use TwoProd + cross terms — no branches, fully vectorizable;
* twiddles arrive as dd pairs split from exact f64 host tables.

Accuracy: per-op roundoff ~2^-48; measured rel L2 error vs a true-f64
oracle 1.3e-14 at 2^24 (vs ~8e-15 for the native-f64 path) — well
inside the 1e-10 north-star contract, slightly looser than true f64.
``Options.guess_options`` selects this engine for f64 at n >= 2^22
(where it wins); ``Options(f64_engine="native")`` opts out.

The reference has no analog (CPUs have f64 ALUs); this is TPU-native
performance engineering in the same spirit as the reference's "compute
f32 twiddles in f64" accuracy discipline (src/planner.rs:148-159).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .stockham import LANES, radix_schedule

__all__ = [
    "split_hi_lo",
    "join_hi_lo",
    "dd_radix_tables_host",
    "dd_leaf_correction_host",
    "dd_split_correction_host",
    "stockham_axis2_dd",
    "leaf_fft_dd",
    "tiny_fft_dd",
]

_SPLIT = np.float32(4097.0)  # 2^12 + 1, Dekker split point for f32


# ---------------------------------------------------------------- host side
def split_hi_lo(x64: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split f64 host array into (hi, lo) f32 with hi + lo == f64(x) to
    ~2^-48 relative."""
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def join_hi_lo(hi, lo) -> np.ndarray:
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


@functools.lru_cache(maxsize=32)
def dd_radix_tables_host(max_m: int, max_radix: int = 16):
    """Stockham step twiddles as dd pairs: key (cur, R) -> tuple over
    j = 1..R-1 of (re_hi, re_lo, im_hi, im_lo), each (q, 1, 1) f32."""
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
                    c = np.cos(ang).reshape(q, 1, 1)
                    s = np.sin(ang).reshape(q, 1, 1)
                    entry.append(split_hi_lo(c) + split_hi_lo(s))
                tables[(cur, R)] = tuple(entry)
            cur //= R
        m *= 2
    return tables


@functools.lru_cache(maxsize=32)
def dd_leaf_correction_host(n1: int, lanes: int):
    """(re_hi, re_lo, im_hi, im_lo) of W_n^(k1*i2), n = n1*lanes."""
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    i2 = np.arange(lanes, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * (k1 * i2) / float(n1 * lanes)
    return split_hi_lo(np.cos(ang)) + split_hi_lo(np.sin(ang))


@functools.lru_cache(maxsize=32)
def dd_split_correction_host(n1: int, n2: int):
    """Factored dd split-correction tables for W_n^(k1*i2), n = n1*n2,
    mirroring stockham.split_correction_host: with i2 = a*S + b,
    W_n^(k1*i2) = T1[k1,a] * T2[k1,b]; memory O(n1*sqrt(n2)) dd entries.
    Returns (S, T1 dd 4-tuple (n1, n2/S), T2 dd 4-tuple (n1, S))."""
    n = n1 * n2
    s = 1 << ((n2.bit_length() - 1) // 2)
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    a = np.arange(n2 // s, dtype=np.float64)[None, :]
    b = np.arange(s, dtype=np.float64)[None, :]
    ang1 = (-2.0 * np.pi / n) * (k1 * (a * s))
    ang2 = (-2.0 * np.pi / n) * (k1 * b)
    t1 = split_hi_lo(np.cos(ang1)) + split_hi_lo(np.sin(ang1))
    t2 = split_hi_lo(np.cos(ang2)) + split_hi_lo(np.sin(ang2))
    return s, t1, t2


# ------------------------------------------------------------- dd primitives
def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_renorm(s, e):
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def dd_add(ahi, alo, bhi, blo):
    s, e = _two_sum(ahi, bhi)
    e = e + (alo + blo)
    return _quick_renorm(s, e)


def dd_sub(ahi, alo, bhi, blo):
    return dd_add(ahi, alo, -bhi, -blo)


def dd_neg(ahi, alo):
    return -ahi, -alo


def _veltkamp(a):
    """Dekker/Veltkamp split a = hi + lo with 12-bit halves (exact)."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _prod_presplit(a, alo, asp, b, blo, bsp):
    """Lazy dd*dd product with both operands' Veltkamp splits given
    (``asp``/``bsp`` = (hi, lo) split pairs of the HI components) —
    sharing splits across the four products of a complex multiply saves
    ~8 VPU ops per product vs. re-splitting inside each TwoProd."""
    p = a * b
    e = ((asp[0] * bsp[0] - p) + asp[0] * bsp[1] + asp[1] * bsp[0]) + (
        asp[1] * bsp[1]
    )
    return p, e + (a * blo + alo * b)


def dd_mul(ahi, alo, bhi, blo):
    p, e = _two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return _quick_renorm(p, e)


def dd_scale(ahi, alo, c: float):
    """dd * exactly-representable-f32 scalar constant."""
    c32 = np.float32(c)
    p, e = _two_prod(ahi, jnp.float32(c32))
    e = e + alo * c32
    return _quick_renorm(p, e)


def dd_cmul(ar, al, ai, ail, br, brl, bi, bil):
    """Complex dd multiply: (ar+i*ai) * (br+i*bi), each component dd.

    Each of the four operand HI components is Veltkamp-split ONCE and
    the split shared across its two products (ar->t1,t3; br->t1,t4; ...),
    and the products stay lazy until the final combine — ~25% fewer VPU
    ops than four independent dd_muls + full adds at the same one-renorm-
    per-output contract (the engine is VPU-throughput-bound, so ops are
    time)."""
    arsp = _veltkamp(ar)
    aisp = _veltkamp(ai)
    brsp = _veltkamp(br)
    bisp = _veltkamp(bi)
    t1 = _prod_presplit(ar, al, arsp, br, brl, brsp)
    t2 = _prod_presplit(ai, ail, aisp, bi, bil, bisp)
    t3 = _prod_presplit(ar, al, arsp, bi, bil, bisp)
    t4 = _prod_presplit(ai, ail, aisp, br, brl, brsp)
    reh, rel = _dd_sub_lazy(t1[0], t1[1], t2[0], t2[1])
    imh, iml = _dd_add_lazy(t3[0], t3[1], t4[0], t4[1])
    return _quick_renorm(reh, rel) + _quick_renorm(imh, iml)


# ---------------------------------------------------------- lazy primitives
# Lazy (non-renormalizing) dd ops for the register-resident DFT. Skipping
# _quick_renorm between butterfly levels lets |lo| grow to a few ulps of
# |hi| inside one radix step; the only term ever dropped is alo*blo,
# bounded by ~2^-44 of the operand scale — far inside the 1e-13 engine
# budget — and stockham_axis2_dd renormalizes every output once per radix
# step. Measured on v5e this removes ~25% of the engine's VPU ops (the
# FFT is dd-add bound).


def _dd_add_lazy(ahi, alo, bhi, blo):
    s, e = _two_sum(ahi, bhi)
    return s, e + (alo + blo)


def _dd_sub_lazy(ahi, alo, bhi, blo):
    return _dd_add_lazy(ahi, alo, -bhi, -blo)


def _dd_mul_const_lazy(ahi, alo, chi: float, clo: float):
    p, e = _two_prod(ahi, jnp.float32(np.float32(chi)))
    return p, e + (ahi * np.float32(clo) + alo * np.float32(chi))


def dd_cmul_lazy(ar, al, ai, ail, br, brl, bi, bil):
    """dd_cmul without the output renormalization: outputs stay lazy
    (|lo| may reach a few ulps of |hi|). For pipelines that END in an
    f64 join (hi + lo in f64) the renorm is pure waste — the join sums
    the components exactly — and skipping it removes ~30% of the VPU
    ops. Same shared-Veltkamp-split structure as dd_cmul."""
    arsp = _veltkamp(ar)
    aisp = _veltkamp(ai)
    brsp = _veltkamp(br)
    bisp = _veltkamp(bi)
    t1 = _prod_presplit(ar, al, arsp, br, brl, brsp)
    t2 = _prod_presplit(ai, ail, aisp, bi, bil, bisp)
    t3 = _prod_presplit(ar, al, arsp, bi, bil, bisp)
    t4 = _prod_presplit(ai, ail, aisp, br, brl, brsp)
    reh, rel = _dd_sub_lazy(t1[0], t1[1], t2[0], t2[1])
    imh, iml = _dd_add_lazy(t3[0], t3[1], t4[0], t4[1])
    return reh, rel, imh, iml


# ------------------------------------------------- dd register-resident DFT
def _dft_regs_dd(pairs):
    """DFT across a list of 2^k complex dd values, each a 4-tuple
    (re_hi, re_lo, im_hi, im_lo) of arrays. Mirrors stockham._dft_regs
    with dd arithmetic; the w = 1 / -i / diagonal special cases matter
    even more here (a dd multiply costs ~25 VPU ops). All intermediates
    are lazy (unnormalized) dd values — the caller renormalizes."""
    m = len(pairs)
    if m == 1:
        return pairs
    ev = _dft_regs_dd(pairs[0::2])
    od = _dft_regs_dd(pairs[1::2])
    out = [None] * m
    for j in range(m // 2):
        erh, erl, eih, eil = ev[j]
        orh, orl, oih, oil = od[j]
        ang = -2.0 * np.pi * j / m
        c, s = float(np.cos(ang)), float(np.sin(ang))
        if j == 0:  # w = 1
            trh, trl, tih, til = orh, orl, oih, oil
        elif 4 * j == m:  # w = -i: t = (oi, -or)
            trh, trl, tih, til = oih, oil, -orh, -orl
        elif abs(abs(c) - abs(s)) < 1e-15:
            # w = c*(1 -+ i); c is NOT exactly representable in f32, so
            # split it into a dd constant and do two dd multiplies by a
            # scalar dd — still far cheaper than a full dd cmul.
            chi = float(np.float32(c))
            clo = float(np.float32(c - chi))
            if s * c < 0:  # w = c*(1 - i): t = c*(or + oi) + i*c*(oi - or)
                ph, pl = _dd_add_lazy(orh, orl, oih, oil)
                qh, ql = _dd_sub_lazy(oih, oil, orh, orl)
            else:  # w = c*(1 + i), c < 0: t = c*(or - oi) + i*c*(oi + or)
                ph, pl = _dd_sub_lazy(orh, orl, oih, oil)
                qh, ql = _dd_add_lazy(oih, oil, orh, orl)
            trh, trl = _dd_mul_const_lazy(ph, pl, chi, clo)
            tih, til = _dd_mul_const_lazy(qh, ql, chi, clo)
        else:
            chi = float(np.float32(c))
            clo = float(np.float32(c - chi))
            shi = float(np.float32(s))
            slo = float(np.float32(s - shi))
            t1h, t1l = _dd_mul_const_lazy(orh, orl, chi, clo)
            t2h, t2l = _dd_mul_const_lazy(oih, oil, shi, slo)
            t3h, t3l = _dd_mul_const_lazy(orh, orl, shi, slo)
            t4h, t4l = _dd_mul_const_lazy(oih, oil, chi, clo)
            trh, trl = _dd_sub_lazy(t1h, t1l, t2h, t2l)
            tih, til = _dd_add_lazy(t3h, t3l, t4h, t4l)
        out[j] = _dd_add_lazy(erh, erl, trh, trl) + _dd_add_lazy(
            eih, eil, tih, til
        )
        out[j + m // 2] = _dd_sub_lazy(erh, erl, trh, trl) + _dd_sub_lazy(
            eih, eil, tih, til
        )
    return out


def _dd_mul_const(ahi, alo, chi: float, clo: float):
    """dd * dd-constant (chi, clo python floats, f32-exact values)."""
    p, e = _two_prod(ahi, jnp.float32(np.float32(chi)))
    e = e + (ahi * np.float32(clo) + alo * np.float32(chi))
    return _quick_renorm(p, e)


# ------------------------------------------------------------ dd Stockham
def stockham_axis2_dd(rh, rl, ih, il, tables, m: int, max_radix: int = 16):
    """DFT along axis -2 of (..., m, L) dd-planar arrays (4 f32 arrays)."""
    batch = rh.shape[:-2]
    lanes = rh.shape[-1]
    r = 1
    view = batch + (m, 1, lanes)
    rh, rl, ih, il = (a.reshape(view) for a in (rh, rl, ih, il))
    cur = m
    for R in radix_schedule(m, max_radix):
        q = cur // R
        xs = [
            tuple(
                a[..., j * q : (j + 1) * q, :, :] for a in (rh, rl, ih, il)
            )
            for j in range(R)
        ]
        ys = _dft_regs_dd(xs)

        def renorm(y):
            rh_, rl_ = _quick_renorm(y[0], y[1])
            ih_, il_ = _quick_renorm(y[2], y[3])
            return rh_, rl_, ih_, il_

        # _dft_regs_dd outputs are lazy; every output is renormalized
        # exactly once per radix step — by dd_cmul's internal renorm on
        # the twiddled digits, explicitly on the untwiddled ones.
        outs = [renorm(ys[0])]
        if q == 1:
            outs += [renorm(ys[j]) for j in range(1, R)]
        else:
            entry = tables[(cur, R)]
            for j in range(1, R):
                wrh, wrl, wih, wil = entry[j - 1]
                yrh, yrl, yih, yil = ys[j]
                outs.append(
                    dd_cmul(yrh, yrl, yih, yil, wrh, wrl, wih, wil)
                )
        shape = batch + (q, R * r, lanes)
        rh = jnp.stack([o[0] for o in outs], axis=-3).reshape(shape)
        rl = jnp.stack([o[1] for o in outs], axis=-3).reshape(shape)
        ih = jnp.stack([o[2] for o in outs], axis=-3).reshape(shape)
        il = jnp.stack([o[3] for o in outs], axis=-3).reshape(shape)
        cur //= R
        r *= R
    final = batch + (m, lanes)
    return (a.reshape(final) for a in (rh, rl, ih, il))


def leaf_fft_dd(rh, rl, ih, il, tables, corr, n1: int):
    """DFT along the last axis of (..., n), n = n1 * LANES, dd planar."""
    batch = rh.shape[:-1]
    view = batch + (n1, LANES)
    rh, rl, ih, il = (a.reshape(view) for a in (rh, rl, ih, il))
    if n1 > 1:
        rh, rl, ih, il = stockham_axis2_dd(rh, rl, ih, il, tables, n1)
        crh, crl, cih, cil = corr
        rh, rl, ih, il = dd_cmul(rh, rl, ih, il, crh, crl, cih, cil)
    rh, rl, ih, il = (jnp.swapaxes(a, -1, -2) for a in (rh, rl, ih, il))
    rh, rl, ih, il = stockham_axis2_dd(rh, rl, ih, il, tables, LANES)
    out = batch + (n1 * LANES,)
    return tuple(a.reshape(out) for a in (rh, rl, ih, il))


def tiny_fft_dd(rh, rl, ih, il, tables, n: int):
    """DFT along the last axis for n < LANES, dd planar."""
    if n == 1:
        return rh, rl, ih, il
    batch = rh.shape[:-1]
    view = batch + (n, 1)
    rh, rl, ih, il = stockham_axis2_dd(
        *(a.reshape(view) for a in (rh, rl, ih, il)), tables, n
    )
    return tuple(a.reshape(batch + (n,)) for a in (rh, rl, ih, il))
