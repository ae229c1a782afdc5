"""Error-free bf16-slice contractions for the double-float engine.

The df64 engine's round-3 profile: at 2^24 both passes are VPU-bound
(dd column kernel 15.3 ms, dd XLA leaf 19.0 ms on v5e) while the MXU —
197 Tbf16FLOPS of it — sits idle, because a *naive* f32/bf16 matmul
cannot reach dd (~2^-48) accuracy: the MXU accumulates in f32, so even
exact products lose ~sqrt(D) * 2^-24 in the summation.

This module implements the Ozaki-scheme answer (error-free transformed
GEMM, cf. Ozaki et al. 2012; bf16-slice variants are standard on ML
hardware): slice each operand into 8-bit *fixed-point* slices on
power-of-two grids shared along the contraction axis. Then every
slice-pair product is an integer on a known grid, and a D-deep f32
accumulation of integers below 2^24 is EXACT — the MXU becomes a
lossless integer engine. Summing the slice-pair tiers back with TwoSum
gives a double-float result whose only error is the slice truncation,
~2^-(8*NSLICES)*sigma per element: ~1e-12 relative at the default 5
slices / tier<=4 — far inside the engine's 1e-10 contract (the pure-VPU
dd path is kept for callers needing ~1e-14).

Grids: the DFT-matrix operand is sliced on the host against its global
bound (|F| <= 1, Karatsuba sum <= 2); the data operand is sliced
in-kernel against a per-contraction-column power-of-two scale sigma
extracted from the f32 exponent bits (exact, zero-safe). Slices are
*integer-valued* bf16 arrays (|int| <= 128, exactly representable), so
a D<=1024-deep dot of any slice pair stays below 2^21 — inside the f32
mantissa, hence exact.

All functions here are plain jnp and run identically in XLA, in Mosaic
kernels, and under the Pallas interpreter — the kernels in
ops/pallas_ozdd.py call them on VMEM-resident values.

No analog in the reference (CPUs have f64 ALUs); this is the TPU-native
equivalent of its "use the precision the hardware is fast at, keep the
math exact" discipline (src/planner.rs:148-159).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NSLICES",
    "MAXTIER",
    "oz_slice_matrix_host",
    "oz_sigma",
    "oz_slice_data",
    "oz_slice_complex",
    "oz_contract_sliced",
    "oz_cmatmul_dd",
]

#: Slices per operand: 5 x 8 bits ~ 40 significant bits per slice set;
#: with tier truncation below, measured rel L2 vs the f64 oracle at
#: 2^24 is ~1e-12 — inside the 1e-10 contract with margin.
NSLICES = 5

#: Highest slice-pair tier kept (i + j <= MAXTIER): 15 of the 25 pairs;
#: dropped tiers contribute < 2^-44 of the column scale.
MAXTIER = 4


def oz_slice_matrix_host(m: np.ndarray, nslices: int = NSLICES,
                         bound: float = 1.0):
    """Slice a constant matrix (|entries| <= bound, bound a power of 2)
    into ``nslices`` integer-valued bf16 slices on fixed grids:

        m = bound * sum_j s_j * 2^-(7 + 8j),  |s_j| <= 128 integers.

    Done in f64, so the slicing is exact; the residual past the last
    slice is < bound * 2^-(8*nslices + 6)."""
    out = []
    r = np.asarray(m, np.float64) / bound
    for j in range(nslices):
        k = 7 + 8 * j
        s = np.rint(r * (1 << k))
        r = r - s * (2.0 ** -k)
        out.append(jnp.asarray(s.astype(np.float32), jnp.bfloat16))
    return tuple(out)


def oz_sigma(maxabs):
    """(sigma, inv_sigma): exact powers of two with sigma > maxabs >= 0,
    sigma * inv_sigma == 1 exactly, from the f32 exponent bits (no
    transcendentals; zero maps to a tiny sigma whose slices are all
    zero, so zero columns stay exact)."""
    bits = jax.lax.bitcast_convert_type(
        maxabs.astype(jnp.float32), jnp.int32
    )
    # all-i32 arithmetic: under jax_enable_x64 a python-int literal in
    # jnp.clip becomes an i64 constant, and Mosaic's convert lowering
    # recurses forever on i64 (observed on v5e)
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    e = jnp.minimum(
        jnp.maximum((bits >> i32(23)) & i32(0xFF), i32(1)), i32(252)
    ) + i32(1)
    sigma = jax.lax.bitcast_convert_type(e << i32(23), jnp.float32)
    inv = jax.lax.bitcast_convert_type(
        (i32(254) - e) << i32(23), jnp.float32
    )
    return sigma, inv


def oz_slice_data(vh, vl, inv, nslices: int = NSLICES):
    """Slice a dd value (vh, vl) pre-scaled by the exact power-of-two
    ``inv`` (|vh * inv| <= 1) into integer-valued bf16 slices on grids
    2^-(7+8j). Every step is exact f32 arithmetic (the round-to-coarser-
    grid split); the low component folds in once its grid is reached."""
    u = vh * inv  # exact: inv is a power of two
    out = []
    r = u
    for j in range(nslices):
        k = float(1 << (7 + 8 * j))
        s = jnp.round(r * k)
        out.append(s.astype(jnp.bfloat16))
        r = r - s * (1.0 / k)
        if j == 2:
            # |r| <= 2^-24 now; the scaled low half lives at the same
            # grid — one f32 add, error < 2^-48 of the column scale
            r = r + vl * inv
    return out


def _tier_dots(f_slices, x_slices, dot, maxtier: int, only=None):
    """T_s = sum_{i+j=s} dot(f_i, x_j) for s <= maxtier (or just
    s == only). Every dot of integer slices is exact in the f32
    accumulator, and the intra-tier adds are exact (same grid, sums
    < 2^24)."""
    tiers = []
    for s in range(maxtier + 1):
        if only is not None and s != only:
            continue
        acc = None
        for i in range(min(s, len(f_slices) - 1) + 1):
            j = s - i
            if j >= len(x_slices):
                continue
            d = dot(f_slices[i], x_slices[j])
            acc = d if acc is None else acc + d
        tiers.append(acc)
    return tiers


def oz_slice_complex(xr, xi, axis, nslices: int = NSLICES):
    """Shared slicing front-end of oz_cmatmul_dd: slice the dd complex
    operand (and its exact dd sum, on the doubled grid) against a single
    per-contraction-column sigma. Returns (sr, si, ss, sigma) — slice
    lists usable for several contractions against pre-sliced constant
    matrices (e.g. one slicing shared by all digit subsets of a radix
    split: static slices of the bf16 slice arrays are cheap, re-slicing
    is not)."""
    xrh, xrl = xr
    xih, xil = xi
    m = jnp.maximum(
        jnp.max(jnp.abs(xrh), axis=axis, keepdims=True),
        jnp.max(jnp.abs(xih), axis=axis, keepdims=True),
    )
    sigma, inv = oz_sigma(m)
    sr = oz_slice_data(xrh, xrl, inv, nslices)
    si = oz_slice_data(xih, xil, inv, nslices)
    sh = xrh + xih
    b = sh - xrh
    sl = ((xrh - (sh - b)) + (xih - b)) + (xrl + xil)
    ss = oz_slice_data(sh, sl, inv * 0.5, nslices)
    return sr, si, ss, sigma


def oz_contract_sliced(fr_slices, fi_slices, fs_slices, sr, si, ss,
                       sigma, dot, maxtier: int = MAXTIER,
                       sigma_map=None):
    """Contraction back-end of oz_cmatmul_dd on pre-sliced operands
    (see oz_slice_complex). Returns (re_hi, re_lo, im_hi, im_lo).

    Tiers are folded into the dd accumulators AS they are produced
    (same arithmetic order as the list-then-combine form: tier 0/1 via
    TwoSum, tiers >= 2 pre-summed in f32 and added to the low word) —
    holding all 2*(maxtier+1) tier arrays live was the dominant VMEM
    spill source in the fused kernels (121 MiB of register-allocator
    spill slots at the 2^20 ozleafT shape on v5e)."""
    if sigma_map is not None:
        sigma = sigma_map(sigma)
    scale = sigma * float(2.0 ** -14)
    reh = rel = imh = iml = None
    re_rest = im_rest = None
    for s in range(maxtier + 1):
        a = _tier_dots(fr_slices, sr, dot, s, only=s)[0]
        b2 = _tier_dots(fi_slices, si, dot, s, only=s)[0]
        c = _tier_dots(fs_slices, ss, dot, s, only=s)[0]
        k = scale * float(2.0 ** (-8 * s))
        re_v = (a - b2) * k
        im_v = (4.0 * c - a - b2) * k
        if s == 0:
            reh, imh = re_v, im_v
            rel = jnp.zeros_like(re_v)
            iml = jnp.zeros_like(im_v)
        elif s == 1:
            t = reh + re_v
            b = t - reh
            rel = (reh - (t - b)) + (re_v - b)
            reh = t
            t = imh + im_v
            b = t - imh
            iml = (imh - (t - b)) + (im_v - b)
            imh = t
        else:
            re_rest = re_v if re_rest is None else re_rest + re_v
            im_rest = im_v if im_rest is None else im_rest + im_v
    if re_rest is not None:
        rel = rel + re_rest
        iml = iml + im_rest
    # renormalize
    h2 = reh + rel
    rel = rel - (h2 - reh)
    reh = h2
    h2 = imh + iml
    iml = iml - (h2 - imh)
    imh = h2
    return reh, rel, imh, iml


def oz_cmatmul_dd(fr_slices, fi_slices, fs_slices, xr, xi, dot, axis,
                  nslices: int = NSLICES, maxtier: int = MAXTIER,
                  sigma_map=None):
    """Complex dd contraction (Fr + i*Fi) @ (xr + i*xi) by Karatsuba on
    sliced operands.

    ``fr_slices``/``fi_slices``/``fs_slices``: host slice tuples of Fr,
    Fi and Fr+Fi (fs sliced with bound=2, folded into its scale below).
    ``xr``/``xi``: dd pairs (hi, lo). ``dot(a, b)``: the bf16->f32 slice
    contraction for this stage's dimension numbers. ``axis``: the
    contraction axis of x (for the shared column scale).

    Returns (re_hi, re_lo, im_hi, im_lo). A SINGLE sigma (max over both
    components) scales xr, xi and 2*sigma scales xr+xi, so same-tier
    integers share grids exactly and the Karatsuba combine
    re = P1 - P2, im = P3 - P1 - P2 happens on exact integers.
    ``sigma_map`` re-aligns the keepdims sigma to the dot OUTPUT's axes
    (e.g. an NT-contraction maps x's (R, 1) scale to (1, R)); default
    identity."""
    sr, si, ss, sigma = oz_slice_complex(xr, xi, axis, nslices)
    return oz_contract_sliced(
        fr_slices, fi_slices, fs_slices, sr, si, ss, sigma, dot,
        maxtier, sigma_map,
    )
