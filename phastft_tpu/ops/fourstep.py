"""Four-step (Bailey) decomposition driver for large transforms.

TPU-native equivalent of the reference's cache-oblivious recursive driver
(/root/reference/src/algorithms/dit.rs:29-97): the reference splits until a
block fits L1 and runs fused codelets at the leaves; here a transform is
split as n = N1 * N2 until a row fits the VMEM-friendly leaf
(ops/stockham.leaf_fft), with the cross-block butterfly stages replaced by
the four-step's transpose + twiddle-correction structure:

    A[i1, i2] = x[i1*N2 + i2]                       (reshape, free)
    B[i2, k1] = row-FFT_{N1}(A^T)                   (recursive)
    C[i2, k1] = B * W_n^(k1*i2)                     (on-the-fly twiddles)
    D[k1, k2] = row-FFT_{N2}(C^T)                   (recursive)
    X[k1 + k2*N1] = D[k1, k2]  ->  output = D^T     (transpose, reshape)

The correction twiddles for split levels are generated on the fly from
iota + trig in f64 and fused by XLA into the consuming multiply — at
2^30 a materialized table would be as large as the data (the analog of
the reference keeping only per-stage tables, src/planner.rs:75-99).

Large batches are processed in power-of-2 chunks via lax.scan so each
chunk's whole stage pipeline stays cache-resident instead of making one
HBM pass per stage — the TPU analog of the reference's
L1_BLOCK_SIZE-bounded recursion (src/algorithms/dit.rs:27).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .mxu import leaf_fft_mxu
from .pallas_col import colfft_pallas
from .pallas_leaf import (
    leaf_fft_pallas,
    leaf_fft_pallas3,
    leaf_fft_pallas_hybrid,
    pallas_available,
)
from .pallas_transpose import transpose2_pallas
from .stockham import LANES, leaf_fft, stockham_axis2, tiny_fft


def _use_pallas(flag=None) -> bool:
    """Whether the fused Pallas kernels may run.

    ``flag`` is the per-call/planner ``Options.use_pallas`` (None = auto).
    The PHASTFT_TPU_NO_PALLAS env var is an emergency global off switch;
    empty, "0" and "false" mean enabled-default (not any-string-disables).
    """
    env = os.environ.get("PHASTFT_TPU_NO_PALLAS", "")
    if env not in ("", "0", "false", "False"):
        return False
    if flag is False:
        return False
    return pallas_available()


__all__ = ["plan_rows", "fft_rows", "max_table_size", "leaf_sizes"]

# Largest row transform executed as a single leaf. 2^16 complex f64 =
# 1 MiB planar buffers; the Stockham pipeline for one chunk stays well
# inside VMEM-class memory.
DEFAULT_LEAF_LIMIT = 1 << 16

# Target bytes per chunk when scanning over large batches.
_CHUNK_BYTES = 4 << 20

# Largest column factor a single split level may take: the fused Pallas
# column kernel declines n1 > 2048 (ops/pallas_col.py), and a deeper XLA
# Stockham column pass makes one HBM round trip per radix step. Past this,
# nest another split level instead — every level stays on fused kernels
# (col + corr is 1 round trip each; 2 levels = 5 round trips total at
# 2^28 vs ~7 slow XLA passes for a 4096-deep column transform).
_MAX_COL_N1 = 2048

# Column factor used for the outer level(s) of a deeply nested split
# (n too large for the inner-size rule below): 2 radix-16 Stockham
# steps, a sweet spot of the fused column kernel.
_NESTED_COL_N1 = 256


def plan_rows(n: int, leaf_limit: int = DEFAULT_LEAF_LIMIT):
    """Static decomposition plan for a length-n row FFT (pure function of
    n, computed at trace time).

    A split keeps the column transform (size n1) as a *direct* Stockham
    pass along the sublane axis — no transpose is ever taken before it, so
    the full lane width stays busy regardless of n1. Only the final
    output reordering is a real transpose (and even that fuses into the
    leaf kernel's output BlockSpec on the f32 fused two-pass path,
    ops/pallas_leaft.py). Past the fused column kernel's n1 ceiling
    (_MAX_COL_N1) the plan nests another split level sized so the inner
    transform is leaf_limit * 128 — its column factor is then exactly
    128, the smallest the transposed-write fused pipeline accepts — so
    2^26..2^31 run as one classic outer level around a fused two-pass
    inner level."""
    if n < LANES:
        return ("tiny", n)
    if n <= leaf_limit:
        return ("leaf", n // LANES)
    n1 = n // leaf_limit
    if n1 > _MAX_COL_N1:
        # nested split: cap the column factor and recurse on a larger
        # inner transform (which splits again) so every level keeps the
        # fused column kernel
        n1 = n // (leaf_limit << 7)
        if n1 > _MAX_COL_N1:
            n1 = _NESTED_COL_N1
    n2 = n // n1
    return ("split", n1, plan_rows(n2, leaf_limit), n2)


def max_table_size(plan) -> int:
    """Largest Stockham step length needed by ``plan``."""
    kind = plan[0]
    if kind == "tiny":
        return plan[1]
    if kind == "leaf":
        return max(plan[1], LANES)
    return max(plan[1], max_table_size(plan[2]))


def leaf_sizes(plan) -> tuple:
    """All (n1) leaf factors appearing in ``plan`` (for planner tables)."""
    kind = plan[0]
    if kind == "tiny":
        return ()
    if kind == "leaf":
        return (plan[1],)
    return leaf_sizes(plan[2])


def _split_correction(n1: int, n2: int, dtype):
    """On-the-fly W_n^(k1*i2) as an (n1, n2) [k1, i2] array; exact f64
    angle generation (products < 2^53), single rounding to dtype. XLA
    fuses the iota+trig into the consuming multiply, so no O(n) table
    ever lands in HBM."""
    k1 = jax.lax.broadcasted_iota(jnp.float64, (n1, n2), 0)
    i2 = jax.lax.broadcasted_iota(jnp.float64, (n1, n2), 1)
    frac = (k1 * i2) * (1.0 / float(n1 * n2))
    ang = (-2.0 * np.pi) * frac
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def _out_transpose(d_re, d_im, batch, n1: int, n2: int, use_pallas):
    """The four-step's final (n1, n2) -> (n2, n1) output reordering.

    The tiled Pallas pair-transpose is OPT-IN (PHASTFT_TPU_PALLAS_
    TRANSPOSE=1): at big-n1 shapes XLA's transpose is near the copy
    roofline (4.46 ms Pallas vs 3.61 ms XLA at f32 2^24). Known cost:
    at the nested plans' small-n1 outer levels XLA's lowering degrades
    (~26 ms at f32 2^26, round-5 profile) — a flat-writing kernel was
    prototyped but Mosaic has no strided lane access to express the
    lane merge, so the XLA form stands (scratch/r5/f32_breakdown.md)."""
    n = n1 * n2
    if (
        not batch
        and _use_pallas(use_pallas)
        and os.environ.get("PHASTFT_TPU_PALLAS_TRANSPOSE", "")
        not in ("", "0", "false", "False")
    ):
        out = transpose2_pallas(d_re, d_im)
        if out is not None:
            return out[0].reshape(n), out[1].reshape(n)
    o_re = jnp.swapaxes(d_re, -1, -2).reshape(batch + (n,))
    o_im = jnp.swapaxes(d_im, -1, -2).reshape(batch + (n,))
    return o_re, o_im


def _chunk_rows(fn, re, im, n_out: int):
    """Apply ``fn`` ((B, n) -> (B, n_out) pair) over the leading batch in
    cache-sized power-of-2 chunks via scan. Falls back to one call when the
    batch doesn't split."""
    batch = re.shape[:-1]
    n = re.shape[-1]
    b = int(np.prod(batch)) if batch else 1
    re2 = re.reshape(b, n)
    im2 = im.reshape(b, n)
    itemsize = np.dtype(re.dtype).itemsize
    target = max(1, _CHUNK_BYTES // (2 * n * itemsize))
    ch = 1
    while ch * 2 <= target and b % (ch * 2) == 0:
        ch *= 2
    if ch >= b or b % ch != 0:
        out_re, out_im = fn(re2, im2)
    else:

        def body(_, xs):
            r, i = fn(xs[0], xs[1])
            return None, (r, i)

        _, (out_re, out_im) = jax.lax.scan(
            body, None, (re2.reshape(b // ch, ch, n), im2.reshape(b // ch, ch, n))
        )
    return (
        out_re.reshape(batch + (n_out,)),
        out_im.reshape(batch + (n_out,)),
    )


#: Measured default for the fused f32 leaf kernel (Options.leaf_kernel =
#: None and no PHASTFT_TPU_LEAF_KERNEL env var). Round-3 on-device race
#: at 2^24 f32, r4mxu column engine, v5e (scratch/r3/race_results.json):
#: mxu3 2.355 ms < mxu2 3.224 ms < hybrid 5.620 ms end-to-end. Round-4
#: size sweep (scratch/r4/race_leafk.json, classic 2^16-leaf plans):
#: mxu3 wins at 2^16 (0.015 vs 0.080 ms), 2^20/2^22/2^23 (1.32 vs
#: 1.67 ms) and a 16-batch 2^18 (1.27 vs 1.53); mxu2's one win is
#: single-row 2^18 by ~10% (0.141 vs 0.157) — not worth a size carve-
#: out. The three-factor split cuts the MXU MACs/element roughly in
#: half vs the balanced two-factor leaf.
DEFAULT_LEAF_KERNEL = "mxu3"


def _resolve_leaf_kernel(flag=None) -> str:
    """Resolved Options.leaf_kernel: "mxu2" | "mxu3" | "hybrid".

    ``flag`` wins when set; else the PHASTFT_TPU_LEAF_KERNEL env var;
    else the measured default. Unknown values fall back to the default
    (the dispatch below additionally falls back per-shape when a
    variant's tables are missing or its kernel declines the batch)."""
    v = flag or os.environ.get("PHASTFT_TPU_LEAF_KERNEL", "")
    if v in ("mxu2", "mxu3", "hybrid"):
        return v
    return DEFAULT_LEAF_KERNEL


def fft_rows(re, im, plan, tables, corrs, *, chunked: bool = True,
             use_pallas=None, leaf_kernel=None, col_engine=None):
    """DFT along the last axis following ``plan``.

    ``tables``: dict (step length, radix) -> twiddle pairs (device arrays).
    ``corrs``: dict of leaf/split correction tables and (when the planner
    chose the MXU strategy) DFT matrices, keyed by strings.
    ``use_pallas``: the per-call Options.use_pallas (None = auto).
    ``leaf_kernel`` / ``col_engine``: the per-call engine knobs
    (options.py); None defers to env-var/measured defaults.
    """
    kind = plan[0]
    if kind == "tiny":
        return tiny_fft(re, im, tables, plan[1])
    if kind == "leaf":
        n1 = plan[1]
        if f"mxu{n1}" in corrs:
            mats = corrs[f"mxu{n1}"]
            if n1 > 1 and _use_pallas(use_pallas):
                # fully fused VMEM-resident kernels (ops/pallas_leaf.py);
                # same math, intermediates never touch HBM. None = batch
                # shape doesn't tile -> XLA MXU fallback below. The
                # variant order starts at the selected Options.leaf_kernel
                # and falls back per-shape when a variant's tables are
                # missing or its kernel declines the batch.
                variant = _resolve_leaf_kernel(leaf_kernel)
                mats3 = corrs.get(f"mxu3_{n1}")
                if mats3 is not None and variant == "mxu3":
                    a3 = mats3[0].shape[0]
                    b3 = mats3[3].shape[0]
                    out = leaf_fft_pallas3(re, im, mats3, a3, b3)
                    if out is not None:
                        return out
                # Hybrid: in-kernel VPU Stockham over n1 + one MXU
                # contraction over the 128 lanes; reuses the classic
                # F(128) matrices and the natural-layout leaf correction.
                if variant == "hybrid" and f"leaf{n1}" in corrs:
                    hmats = mats[3:6] + corrs[f"leaf{n1}"]
                    out = leaf_fft_pallas_hybrid(re, im, hmats, n1)
                    if out is not None:
                        return out
                # Balanced factorization: fewer MXU MACs/element.
                mats2 = corrs.get(f"mxu2_{n1}")
                if mats2 is not None:
                    na = mats2[0].shape[0]
                    out = leaf_fft_pallas(
                        re, im, mats2, na, (n1 * LANES) // na
                    )
                    if out is not None:
                        return out
                if f"leaf{n1}" in corrs:
                    pmats = mats[:6] + corrs[f"leaf{n1}"]
                    out = leaf_fft_pallas(re, im, pmats, n1)
                    if out is not None:
                        return out

            def run(r, i):
                return leaf_fft_mxu(r, i, mats, n1)

            # MXU leaves run unchunked: the matmul streams HBM itself and
            # scan chunking only adds loop overhead.
            return run(re, im)
        cr, ci = corrs[f"leaf{n1}"] if n1 > 1 else (None, None)

        def run(r, i):
            return leaf_fft(r, i, tables, cr, ci, n1)

        if chunked:
            return _chunk_rows(run, re, im, n1 * LANES)
        return run(re, im)

    _, n1, plan2, n2 = plan
    batch = re.shape[:-1]
    a_re = re.reshape(batch + (n1, n2))
    a_im = im.reshape(batch + (n1, n2))
    # HBM-minimal fused two-pass pipeline: the column kernel lands its
    # slabs in the (A, n1, 128) relayout and the transposed-write leaf
    # kernel (ops/pallas_leaft.py) absorbs the four-step's final
    # transpose into its output BlockSpec — two HBM round trips total,
    # the algorithmic minimum for one split level. Engaged when the
    # planner built the handshake tables (f32, 128 <= n1 <= 2048 with
    # n1 % 128 == 0, inner plan a plain leaf).
    pcolt = corrs.get(f"pcolT{n1}x{n2}")
    leaft = corrs.get(f"leafT{n2}")
    if (
        pcolt is not None
        and leaft is not None
        and plan2[0] == "leaf"
        and n1 % 128 == 0
        and 128 <= n1 <= 2048
        and _use_pallas(use_pallas)
        and os.environ.get("PHASTFT_TPU_NO_FUSED2", "")
        in ("", "0", "false", "False")
    ):
        from .pallas_leaft import leaft_pallas

        c3 = colfft_pallas(a_re, a_im, pcolt, n1, engine=col_engine,
                           out3d=True)
        if c3 is not None:
            out = leaft_pallas(c3[0], c3[1], leaft, n1)
            if out is not None:
                return out
            # both eligibility checks are static, so this is unreachable
            # in practice; recompute the classic layout defensively
            del c3
    # column FFTs over i1 (size n1) + split correction. Fast path: the
    # fused Pallas column kernel (ops/pallas_col.py) does all radix
    # steps and the correction in one HBM round trip (measured 1.2 ms
    # vs 7.6 ms for the XLA lowering at (256, 65536) f32 on v5e).
    fused = None
    pcol = corrs.get(f"pcol{n1}x{n2}")
    if pcol is not None and _use_pallas(use_pallas):
        fused = colfft_pallas(a_re, a_im, pcol, n1, engine=col_engine)
    if fused is not None:
        c_re, c_im = fused
        d_re, d_im = fft_rows(c_re, c_im, plan2, tables, corrs,
                              chunked=chunked, use_pallas=use_pallas,
                              leaf_kernel=leaf_kernel,
                              col_engine=col_engine)
        return _out_transpose(d_re, d_im, batch, n1, n2, use_pallas)
    # XLA path: Stockham directly along the sublane axis — every lane of
    # the n2-wide rows stays busy, no transpose.
    b_re, b_im = stockham_axis2(a_re, a_im, tables, n1)
    # twiddle correction W_n^(k1*i2): factored planner tables when
    # available (two fused cmuls), else on-the-fly trig
    fac = corrs.get(f"split{n1}x{n2}")
    if fac is not None:
        t1r, t1i, t2r, t2i = fac
        s = t2r.shape[1]  # static from table shape
        shape = batch + (n1, n2 // s, s)
        br = b_re.reshape(shape)
        bi = b_im.reshape(shape)
        u_r = br * t1r[:, :, None] - bi * t1i[:, :, None]
        u_i = br * t1i[:, :, None] + bi * t1r[:, :, None]
        c_re = (u_r * t2r[:, None, :] - u_i * t2i[:, None, :]).reshape(
            batch + (n1, n2)
        )
        c_im = (u_r * t2i[:, None, :] + u_i * t2r[:, None, :]).reshape(
            batch + (n1, n2)
        )
    else:
        cr, ci = _split_correction(n1, n2, re.dtype)
        c_re = b_re * cr - b_im * ci
        c_im = b_re * ci + b_im * cr
    # row FFTs over i2 (size n2) for each k1, chunk-cached leaf
    d_re, d_im = fft_rows(c_re, c_im, plan2, tables, corrs,
                          chunked=chunked, use_pallas=use_pallas,
                          leaf_kernel=leaf_kernel, col_engine=col_engine)
    # X[k1 + k2*n1] = D[k1, k2] -> the one real transpose of the transform
    return _out_transpose(d_re, d_im, batch, n1, n2, use_pallas)


# --------------------------------------------------------------------------
# Double-float (df64) driver — the fast-f64 engine (ops/df64.py). Same plan
# shapes as fft_rows, dd arithmetic, dd tables from the planner.
# --------------------------------------------------------------------------


#: Measured default for the dd leaf engine (see fft_rows_dd). "xla" was
#: the round-2 winner; the round-3 "split" candidate is raced on device
#: before any flip.
DEFAULT_DD_LEAF = "xla"


def _ddleaf_split(rh, rl, ih, il, n1: int):
    """dd leaf as two fused dd column kernels + one XLA transpose.

    Pass 1: ddcol_pallas over the n1 factor with the leaf correction
    folded in (dd_col_tables_host(n1, LANES) IS the factored
    W_{n1*LANES}^(k1*i2) table). Pass 2 (after an XLA swapaxes, a plain
    copy pass): bare dd column DFT over the 128-lane factor. Output
    reshape (LANES, n1) -> flat is the natural order X[k1 + k2*n1].
    Returns None when the shapes don't fit the kernels."""
    from .pallas_dd import (
        dd_col_tables_host,
        ddcol_pallas,
        ddcol_pallas_nocorr,
    )

    batch = rh.shape[:-1]
    view = batch + (n1, LANES)
    arrs = [a.reshape(view) for a in (rh, rl, ih, il)]
    _t, t1, t2 = dd_col_tables_host(n1, LANES)
    out = ddcol_pallas(*arrs, t1, t2, n1)
    if out is None:
        return None
    arrs = [jnp.swapaxes(a, -1, -2) for a in out]
    out2 = ddcol_pallas_nocorr(*arrs, LANES)
    if out2 is None:
        return None
    flat = batch + (n1 * LANES,)
    return tuple(a.reshape(flat) for a in out2)


def _out_transpose_dd(arrs, batch, n1: int, n2: int, use_pallas):
    """Four-step output reordering for the 4-array dd representation."""
    n = n1 * n2
    out = batch + (n,)
    return tuple(jnp.swapaxes(a, -1, -2).reshape(out) for a in arrs)


def _chunk_rows_dd(fn, arrs, n_out: int):
    """_chunk_rows for the 4-array dd representation."""
    batch = arrs[0].shape[:-1]
    n = arrs[0].shape[-1]
    b = int(np.prod(batch)) if batch else 1
    flat = [a.reshape(b, n) for a in arrs]
    target = max(1, _CHUNK_BYTES // (2 * n * 8))  # dd row = 2 * 8 bytes
    ch = 1
    while ch * 2 <= target and b % (ch * 2) == 0:
        ch *= 2
    if ch >= b or b % ch != 0:
        outs = fn(*flat)
    else:

        def body(_, xs):
            return None, fn(*xs)

        _, outs = jax.lax.scan(
            body, None, tuple(a.reshape(b // ch, ch, n) for a in flat)
        )
    return tuple(o.reshape(batch + (n_out,)) for o in outs)


def fft_rows_dd(rh, rl, ih, il, plan, tables, corrs, *, use_pallas=None,
                dd_leaf=None):
    """DFT along the last axis in dd arithmetic following ``plan``.

    ``tables``: dd radix tables (df64.dd_radix_tables_host, on device).
    ``corrs``: dict with dd leaf corrections ("ddleaf{n1}"), factored
    dd split corrections ("ddsplit{n1}x{n2}"), and — on TPU — the
    Pallas column-kernel tables ("ddpcol{n1}x{n2}")."""
    from .df64 import (
        dd_cmul,
        leaf_fft_dd,
        stockham_axis2_dd,
        tiny_fft_dd,
    )

    kind = plan[0]
    if kind == "tiny":
        return tiny_fft_dd(rh, rl, ih, il, tables, plan[1])
    if kind == "leaf":
        n1 = plan[1]
        corr = corrs[f"ddleaf{n1}"] if n1 > 1 else None
        # dd leaf engines, from fastest-believed down:
        #   "split": two fused dd column kernels (the shape that WINS as
        #     the four-step column pass) + one XLA transpose between —
        #     avoids both the XLA leaf's per-step restacking passes and
        #     the monolithic Pallas leaf's Mosaic-hostile in-kernel
        #     transpose. The leaf correction W_{n1*128}^(k1*i2) is
        #     exactly what dd_col_tables_host(n1, 128) factors.
        #   "fused": the monolithic VMEM-resident leaf kernel — exact on
        #     hardware but Mosaic schedules its 5-step pipeline poorly
        #     (32.1 vs 19.5 ms XLA at 2^24 shapes); legacy opt-in via
        #     Options(use_pallas=True).
        #   "xla": leaf_fft_dd (the measured round-2 default).
        # PHASTFT_TPU_DD_LEAF overrides; DEFAULT_DD_LEAF is flipped when
        # a variant wins on device.
        if n1 > 1 and _use_pallas(use_pallas):
            engine = dd_leaf or os.environ.get("PHASTFT_TPU_DD_LEAF", "")
            if engine not in ("split", "fused", "xla"):
                engine = "fused" if use_pallas is True else DEFAULT_DD_LEAF
            if engine == "split":
                out = _ddleaf_split(rh, rl, ih, il, n1)
                if out is not None:
                    return out
            elif engine == "fused":
                from .pallas_dd import ddleaf_pallas

                out = ddleaf_pallas(rh, rl, ih, il, corr, n1)
                if out is not None:
                    return out

        def run(*a):
            return leaf_fft_dd(*a, tables, corr, n1)

        return _chunk_rows_dd(run, (rh, rl, ih, il), n1 * LANES)

    _, n1, plan2, n2 = plan
    batch = rh.shape[:-1]
    view = batch + (n1, n2)
    rh, rl, ih, il = (a.reshape(view) for a in (rh, rl, ih, il))
    # HBM-minimal dd fused two-pass pipeline on the MXU (ops/pallas_ozdd):
    # Ozaki bf16-slice contractions for both passes, the four-step's
    # output transpose fused into the leaf kernel's BlockSpec. Engaged
    # when the planner built the oz tables (dd_state does so for
    # eligible shapes when the f64 engine is "df64-oz").
    oztabs = corrs.get(f"ozcol{n1}x{n2}")
    ozleaf = corrs.get(f"ozleafT{n2}")
    if (
        oztabs is not None
        and ozleaf is not None
        and plan2[0] == "leaf"
        and n1 % 128 == 0
        and 128 <= n1 <= 2048
        and _use_pallas(use_pallas)
    ):
        from .pallas_ozdd import ozcol_pallas, ozleaft_pallas

        c = ozcol_pallas(rh, rl, ih, il, oztabs, n1)
        if c is not None:
            out = ozleaft_pallas(*c, ozleaf, n1)
            if out is not None:
                return out
            del c
    # fused Pallas dd column kernel: all radix steps + split correction
    # in one HBM round trip (ops/pallas_dd.py); measured 16.4 ms vs
    # 23.9 ms for the XLA lowering at (256, 65536) on v5e -> auto-on.
    # Net with the XLA leaf: df64 2^24 = 26.8 ms vs 30.9 ms native f64.
    pcol = corrs.get(f"ddpcol{n1}x{n2}")
    if pcol is not None and _use_pallas(use_pallas):
        from .pallas_dd import ddcol_pallas

        fused = ddcol_pallas(rh, rl, ih, il, pcol[0], pcol[1], n1)
        if fused is not None:
            outs = fft_rows_dd(
                *fused, plan2, tables, corrs, use_pallas=use_pallas,
                dd_leaf=dd_leaf,
            )
            return _out_transpose_dd(outs, batch, n1, n2, use_pallas)
    rh, rl, ih, il = stockham_axis2_dd(rh, rl, ih, il, tables, n1)
    # factored twiddle correction: two dd complex multiplies
    t1, t2 = corrs[f"ddsplit{n1}x{n2}"]
    s = t2[0].shape[1]  # static factor width from the table shape
    shape = batch + (n1, n2 // s, s)
    rh, rl, ih, il = (a.reshape(shape) for a in (rh, rl, ih, il))
    t1r, t1rl, t1i, t1il = (a[:, :, None] for a in t1)
    rh, rl, ih, il = dd_cmul(rh, rl, ih, il, t1r, t1rl, t1i, t1il)
    t2r, t2rl, t2i, t2il = (a[:, None, :] for a in t2)
    rh, rl, ih, il = dd_cmul(rh, rl, ih, il, t2r, t2rl, t2i, t2il)
    flat = batch + (n1, n2)
    rh, rl, ih, il = (a.reshape(flat) for a in (rh, rl, ih, il))
    outs = fft_rows_dd(rh, rl, ih, il, plan2, tables, corrs,
                       use_pallas=use_pallas, dd_leaf=dd_leaf)
    return _out_transpose_dd(outs, batch, n1, n2, use_pallas)
