"""Distributed four-step FFT: one giant transform sharded across chips.

The capability the reference lacks entirely (SURVEY §2 #14: no NCCL/MPI/
sockets anywhere) and the BASELINE north star demands: N-point C2C with the
data contiguously sharded along the transform axis over a mesh axis, the
global transposes expressed as `jax.lax.all_to_all` over ICI, and the
twiddle correction applied locally from on-the-fly angles.

Layout algebra (D devices, n = N1 * N2, D | N1, D | N2):

  x sharded by rows of A[i1, i2] = x[i1*N2 + i2]    (contiguous shard)
  1. all_to_all row->col shard:  local (N1, N2/D)   [columns i2 local]
  2. column FFTs over i1 (Stockham along sublanes, local)
  3. twiddle W_n^(k1*i2), i2 offset by the device's column base
  4. all_to_all col->row shard:  local (N1/D, N2)   [rows k1 local]
  5. row FFTs over i2 (leaf path, local)
  6. natural-order output: global transpose D[k1,k2] -> out (N2, N1):
     all_to_all + local transpose; skipped when permuted_output=True
     (the caller gets D[k1, k2] row-sharded by k1 — useful for
     convolution-style pipelines that apply a pointwise kernel and run
     the inverse immediately).

Steps 1+2+3 and 4+5 each fuse into one local XLA region per chip, so the
transform is two compute passes plus 2 (or 3) all_to_all transposes —
the same structure that wins weak scaling in classic MPI FFTs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import NonPowerOfTwoError, ensure_power_of_two
from ..ops.fourstep import fft_rows, plan_rows
from ..ops.stockham import stockham_axis2
from ..planner import Direction
from ..fft import _coerce_direction
from .batch import default_mesh

__all__ = ["fft_distributed", "DD_DIST_MIN_COL"]

#: Smallest column factor of the dd distributed factorization: the fused
#: dd column kernel (ops/pallas_dd.ddcol_pallas) needs n1 >= 8, and a
#: shallow column keeps the dd column pass one fused HBM round trip while
#: the row transforms (which carry the log-n work) ride the full fused
#: dd/oz pipeline of fft_rows_dd.
DD_DIST_MIN_COL = 8


def _chunk_count(block_bytes: int, cols: int) -> int:
    """Comm/compute-overlap chunk count for the chunked collective
    pipeline: chunks of the local column block let XLA's latency-hiding
    scheduler overlap chunk i's all_to_all with chunk i+1's compute.

    Default 4 above ~8 MiB of local block (below that the per-collective
    latency dominates); the PHASTFT_TPU_DIST_CHUNKS env var overrides
    for tuning (tune.py races it on device when wisdom is enabled)."""
    import os

    v = os.environ.get("PHASTFT_TPU_DIST_CHUNKS", "")
    if v.isdigit() and int(v) >= 1:
        c = int(v)
        return c if cols % c == 0 else 1
    return 4 if (block_bytes >= (8 << 20) and cols % 4 == 0) else 1


def _factor(n: int, d: int, leaf_limit: int) -> tuple[int, int]:
    """Pick n = N1 * N2 with D | N1, D | N2, N2 <= leaf-friendly size and
    N1 as small as possible (column pass cost grows with log N1)."""
    log_n = n.bit_length() - 1
    log_d = d.bit_length() - 1
    log_leaf = leaf_limit.bit_length() - 1
    log_n2 = min(log_leaf, log_n - log_d)
    log_n1 = log_n - log_n2
    if log_n1 < log_d or log_n2 < log_d:
        raise NonPowerOfTwoError(
            f"n=2^{log_n} too small to shard over {d} devices "
            f"(need n >= {d * d})"
        )
    return 1 << log_n1, 1 << log_n2


def _row_to_col(xl, n1, n2, d, axis_name):
    """(N1/D, N2) row shard -> (N1, N2/D) column shard."""
    a = xl.reshape(n1 // d, d, n2 // d)
    b = jax.lax.all_to_all(a, axis_name, split_axis=1, concat_axis=0,
                           tiled=True)
    return b.reshape(n1, n2 // d)


def _col_to_row(xl, n1, n2, d, axis_name):
    """(N1, N2/D) column shard -> (N1/D, N2) row shard."""
    a = xl.reshape(d, n1 // d, n2 // d)
    b = jax.lax.all_to_all(a, axis_name, split_axis=0, concat_axis=2,
                           tiled=True)
    return b.reshape(n1 // d, n2)


def _local_correction_cols(n1, n2, col_base, ncols, dtype):
    """W_n^(k1 * i2) for the column block [col_base, col_base + ncols)."""
    k1 = jax.lax.broadcasted_iota(jnp.float64, (n1, ncols), 0)
    i2 = jax.lax.broadcasted_iota(jnp.float64, (n1, ncols), 1)
    i2 = i2 + col_base.astype(jnp.float64)
    frac = (k1 * i2) * (1.0 / float(n1 * n2))
    ang = (-2.0 * np.pi) * frac
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def _pallas_col_chunk(re_c, im_c, n1, n, col_base, ccols, col_engine):
    """One (n1, ccols) column-shard chunk through the fused Pallas column
    kernel (ops/pallas_col.py): all column radix steps + the GLOBAL split
    correction W_n^(k1*i2) in one HBM round trip.

    The kernel's in-kernel T1 phase covers the chunk-local part
    W_n^(k1*(j*T + c)); the shard/chunk column base folds into the T2
    slab table, built in-graph here because it depends on the traced
    device index (exact f64 angles — every k1*i2 product is < n < 2^53).
    Returns None when the shapes don't fit the kernel (caller falls back
    to the XLA form)."""
    from ..ops.pallas_col import col_tile, colfft_pallas

    t = col_tile(n1, ccols)
    if ccols % t != 0 or re_c.dtype != jnp.float32:
        return None
    k1v = jax.lax.broadcasted_iota(jnp.float64, (n1, t), 0)
    cv = jax.lax.broadcasted_iota(jnp.float64, (n1, t), 1)
    i2 = cv + col_base.astype(jnp.float64)
    ang = (-2.0 * np.pi) * ((k1v * i2) * (1.0 / float(n)))
    tabs = (jnp.cos(ang).astype(jnp.float32),
            jnp.sin(ang).astype(jnp.float32))
    return colfft_pallas(re_c, im_c, tabs, n1, engine=col_engine, n_total=n)


@functools.lru_cache(maxsize=64)
def _build_distributed(n: int, d: int, axis_name: str, leaf_limit: int,
                       scale: bool, permuted_output: bool, devices_key,
                       use_pallas=None, leaf_kernel=None, col_engine=None,
                       permuted_input: bool = False):
    from ..ops.fourstep import _use_pallas

    mesh = default_mesh(axis_name, devices=list(devices_key))
    n1, n2 = _factor(n, d, leaf_limit)
    row_plan = plan_rows(n2, leaf_limit)

    def local_step_permuted_in(re_l, im_l, tables, corrs):
        """Mirrored pipeline consuming the permuted D[k1, k2] layout
        (what permuted_output=True of the same factorization produced),
        returning natural order — the other half of the convolution
        round trip. Derivation: with y[k1 + k2*N1] = Y[k1, k2],

          DFT(y)[m1*N2 + m2] = sum_k1 W_N1^(k1 m1) W_N^(k1 m2)
                               sum_k2 Y[k1, k2] W_N2^(k2 m2)

        i.e. row DFTs over k2 (local), twiddle W_N^(k1*m2) (local, row
        base from the device index), one row->col all_to_all, column
        DFTs over k1, one col->row all_to_all back to the contiguous
        natural shard. Two collectives — a permuted forward + permuted-
        input inverse round trip costs 4 all_to_alls vs 6 for the
        natural-order pair."""
        dev = jax.lax.axis_index(axis_name)
        # 1. row DFTs over k2 (size N2) on the local (N1/D, N2) rows
        r_re, r_im = fft_rows(re_l, im_l, row_plan, tables, corrs,
                              use_pallas=use_pallas,
                              leaf_kernel=leaf_kernel,
                              col_engine=col_engine)
        rows = n1 // d
        row_base = (dev * rows).astype(jnp.float64)
        # 2..4 are chunked over the m2 axis like the forward path, so the
        # scheduler can overlap chunk i's collectives with chunk i+1's
        # twiddle/column compute (each m2 column block is independent:
        # twiddle -> row->col all_to_all -> column DFT over k1 -> col->row
        # all_to_all back to the natural m1-row shard).
        block_bytes = 2 * rows * n2 * np.dtype(r_re.dtype).itemsize
        chunks = _chunk_count(block_bytes, n2 // d)
        ccols = n2 // chunks

        def one_chunk(c):
            sl = slice(c * ccols, (c + 1) * ccols)
            k1 = jax.lax.broadcasted_iota(jnp.float64, (rows, ccols), 0)
            k1 = k1 + row_base
            m2 = jax.lax.broadcasted_iota(jnp.float64, (rows, ccols), 1)
            m2 = m2 + np.float64(c * ccols)
            ang = (-2.0 * np.pi) * ((k1 * m2) * (1.0 / float(n)))
            cr = jnp.cos(ang).astype(r_re.dtype)
            ci = jnp.sin(ang).astype(r_re.dtype)
            t_re = r_re[:, sl] * cr - r_im[:, sl] * ci
            t_im = r_re[:, sl] * ci + r_im[:, sl] * cr
            # column shard of this m2 block: (N1, ccols/D) local
            c_re = _row_to_col(t_re, n1, ccols, d, axis_name)
            c_im = _row_to_col(t_im, n1, ccols, d, axis_name)
            fused = None
            if _use_pallas(use_pallas) and c_re.dtype == jnp.float32:
                from ..ops.pallas_col import colfft_pallas_nocorr

                fused = colfft_pallas_nocorr(c_re, c_im, n1)
            if fused is not None:
                z_re, z_im = fused
            else:
                z_re, z_im = stockham_axis2(c_re, c_im, tables, n1)
            # back to m1-row shard for this m2 block: (N1/D, ccols)
            return (
                _col_to_row(z_re, n1, ccols, d, axis_name),
                _col_to_row(z_im, n1, ccols, d, axis_name),
            )

        parts = [one_chunk(c) for c in range(chunks)]
        if chunks == 1:
            out_re = parts[0][0].reshape(-1)
            out_im = parts[0][1].reshape(-1)
        else:
            # chunk c holds columns [c*ccols/D ...] of every source
            # device: local column index m2 = dev_src*(ccols/d)*? — each
            # chunk's col->row returned (rows, ccols) covering global m2
            # in [c*ccols, (c+1)*ccols): plain concat restores m2 order
            out_re = jnp.concatenate([p[0] for p in parts], axis=1)
            out_re = out_re.reshape(-1)
            out_im = jnp.concatenate([p[1] for p in parts], axis=1)
            out_im = out_im.reshape(-1)
        if scale:
            inv = jnp.asarray(1.0 / n, out_re.dtype)
            out_re = out_re * inv
            out_im = out_im * inv
        return out_re, out_im

    def local_step(re_l, im_l, tables, corrs):
        dev = jax.lax.axis_index(axis_name)
        # 1. to column shard
        re_c = _row_to_col(re_l, n1, n2, d, axis_name)
        im_c = _row_to_col(im_l, n1, n2, d, axis_name)
        # 2+3+4. column FFTs over i1 (size N1) + twiddle correction, then
        # back to the row shard. The per-chip passes run the same fused
        # Pallas engines as the single-chip path (round-2 verdict: the
        # single-chip wins must reach the sharded path): each chunk goes
        # through the fused column kernel — all radix steps + the global
        # correction in one HBM round trip — with the XLA Stockham +
        # on-the-fly-trig form as the structural fallback. Chunking the
        # block lets XLA's latency-hiding scheduler overlap chunk i's
        # col->row all_to_all with chunk i+1's column compute — the lever
        # SURVEY §7 calls out for the weak-scaling target. Chunking only
        # pays above ~8 MiB of local block.
        col_base = dev * (n2 // d)
        local_cols = n2 // d
        block_bytes = 2 * n1 * local_cols * np.dtype(re_c.dtype).itemsize
        chunks = _chunk_count(block_bytes, local_cols)
        ccols = local_cols // chunks
        col_is_pallas = _use_pallas(use_pallas) and re_c.dtype == jnp.float32
        fft_c = None
        if not col_is_pallas:
            # shared XLA column pass (unchunked: each radix step is a
            # full-block HBM pass anyway)
            fft_c = stockham_axis2(re_c, im_c, tables, n1)
        parts = []
        for c in range(chunks):
            sl = slice(c * ccols, (c + 1) * ccols)
            fused = None
            if col_is_pallas:
                fused = _pallas_col_chunk(
                    re_c[:, sl], im_c[:, sl], n1, n,
                    col_base + c * ccols, ccols, col_engine,
                )
            if fused is not None:
                tre, tim = fused
            else:
                if fft_c is None:  # kernel declined: XLA pass after all
                    fft_c = stockham_axis2(re_c, im_c, tables, n1)
                cr, ci = _local_correction_cols(
                    n1, n2, col_base + c * ccols, ccols, re_c.dtype
                )
                tre = fft_c[0][:, sl] * cr - fft_c[1][:, sl] * ci
                tim = fft_c[0][:, sl] * ci + fft_c[1][:, sl] * cr
            # each chunk is a (N1, ccols) column shard -> (N1/D, ccols*D)
            # row shard; independent collectives pipeline across chunks
            parts.append(
                (
                    _col_to_row(tre, n1, ccols * d, d, axis_name),
                    _col_to_row(tim, n1, ccols * d, d, axis_name),
                )
            )
        if chunks == 1:
            re_r, im_r = parts[0]
        else:
            # chunk c holds columns [c*ccols, (c+1)*ccols) of every source
            # device: global column index i2 = dev*local_cols + c*ccols + j
            # -> reassemble along the column axis in (device, chunk) order
            re_r = jnp.concatenate(
                [p[0].reshape(n1 // d, d, ccols) for p in parts], axis=2
            ).reshape(n1 // d, n2)
            im_r = jnp.concatenate(
                [p[1].reshape(n1 // d, d, ccols) for p in parts], axis=2
            ).reshape(n1 // d, n2)
        # 5. local row FFTs over i2 (size N2) — same engine knobs as the
        # single-chip path (fused Pallas leaf kernels fire when the
        # planner's leaf tables cover row_plan's leaf, which they always
        # do: _factor caps N2 at the planner's own leaf limit)
        dre, dim_ = fft_rows(re_r, im_r, row_plan, tables, corrs,
                             use_pallas=use_pallas,
                             leaf_kernel=leaf_kernel,
                             col_engine=col_engine)
        if permuted_output:
            out_re, out_im = dre.reshape(-1), dim_.reshape(-1)
        else:
            # 6. global transpose D[k1,k2] -> (N2, N1) natural order
            ar = dre.reshape(n1 // d, d, n2 // d)  # split k2 by target
            ai = dim_.reshape(n1 // d, d, n2 // d)
            br = jax.lax.all_to_all(ar, axis_name, split_axis=1,
                                    concat_axis=0, tiled=True)
            bi = jax.lax.all_to_all(ai, axis_name, split_axis=1,
                                    concat_axis=0, tiled=True)
            # local (N1, N2/D) holding D[k1, k2 local] -> transpose
            out_re = jnp.swapaxes(br.reshape(n1, n2 // d), 0, 1).reshape(-1)
            out_im = jnp.swapaxes(bi.reshape(n1, n2 // d), 0, 1).reshape(-1)
        if scale:
            inv = jnp.asarray(1.0 / n, out_re.dtype)
            out_re = out_re * inv
            out_im = out_im * inv
        return out_re, out_im

    shard = P(axis_name)
    repl = P()
    step = local_step_permuted_in if permuted_input else local_step
    # check_vma=False: the local step may contain pallas_call regions
    # (fused column/leaf kernels), whose out_shape carries no varying-
    # mesh-axes annotation — the manual collectives here are explicit.
    mapped = jax.shard_map(
        lambda re, im, tables, corrs: step(
            re.reshape(n1 // d, n2), im.reshape(n1 // d, n2), tables, corrs
        ),
        mesh=mesh,
        in_specs=(shard, shard, repl, repl),
        out_specs=(shard, shard),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(re, im, tables, corrs):
        return mapped(re, im, tables, corrs)

    return run, mesh


def _factor_dd(n: int, d: int) -> tuple[int, int]:
    """dd factorization: N1 as SMALL as possible (>= max(DD_DIST_MIN_COL,
    D), D | N1, D | N2). Opposite of _factor's leaf-capped N2: the row
    transforms carry the O(n log n) work through the full fused dd/oz
    pipeline (fft_rows_dd nests its own splits), so the column pass —
    which must pay dd arithmetic per element per radix step — is kept as
    shallow as the fused dd column kernel allows."""
    n1 = max(DD_DIST_MIN_COL, d)
    n2 = n // n1
    if n1 * n2 != n or n2 % d != 0 or n2 < n1:
        raise NonPowerOfTwoError(
            f"n=2^{n.bit_length() - 1} too small to dd-shard over {d} "
            f"devices (need n >= {2 * n1 * max(n1, d)})"
        )
    return n1, n2


@functools.lru_cache(maxsize=16)
def _dd_dist_state(n1: int, n2: int, leaf_limit: int, engine: str):
    """Device tables for the dd distributed pipeline: the row planner's
    dd state (radix tables + leaf/split/oz corrections for plan_rows(n2))
    plus the T-factored GLOBAL dd column-correction tables
    W_n^(k1*i2) = T1[k1, i2//T] * T2[k1, i2%T] (ops/pallas_dd.
    dd_col_tables_host) — per-shard column bases become dynamic slices
    of the replicated T1, so no in-graph dd twiddle synthesis is needed
    on the fused path."""
    from ..options import Options
    from ..planner import PlannerDit64
    from ..ops.pallas_dd import dd_col_tables_host

    leaf = min(leaf_limit, n2)
    rp = PlannerDit64(
        n2, options=Options(leaf_fft_size=leaf, f64_engine=engine)
    )
    tables, corrs = rp.dd_state
    _t, t1, t2 = dd_col_tables_host(n1, n2)
    col_t1 = tuple(jnp.asarray(a) for a in t1)
    col_t2 = tuple(jnp.asarray(a) for a in t2)
    return rp.plan, tables, corrs, col_t1, col_t2


def _dd_split4(re_l, im_l):
    rh = re_l.astype(jnp.float32)
    rl = (re_l - rh.astype(jnp.float64)).astype(jnp.float32)
    ih = im_l.astype(jnp.float32)
    il = (im_l - ih.astype(jnp.float64)).astype(jnp.float32)
    return rh, rl, ih, il


def _dd_corr_trig(n1, n, col_base, ncols):
    """In-graph dd split correction for the column block [col_base,
    col_base + ncols): f64 exact-angle trig (every k1*i2 product is
    < 2^53), Dekker-split to dd. Structural fallback when the block
    doesn't align to the T-factored tables."""
    k1 = jax.lax.broadcasted_iota(jnp.float64, (n1, ncols), 0)
    i2 = jax.lax.broadcasted_iota(jnp.float64, (n1, ncols), 1)
    i2 = i2 + col_base.astype(jnp.float64)
    ang = (-2.0 * np.pi) * ((k1 * i2) * (1.0 / float(n)))
    cr, sr = jnp.cos(ang), jnp.sin(ang)
    ch = cr.astype(jnp.float32)
    cl = (cr - ch.astype(jnp.float64)).astype(jnp.float32)
    sh = sr.astype(jnp.float32)
    sl = (sr - sh.astype(jnp.float64)).astype(jnp.float32)
    return ch, cl, sh, sl


@functools.lru_cache(maxsize=32)
def _build_distributed_dd(n: int, d: int, axis_name: str, leaf_limit: int,
                          scale: bool, permuted_output: bool, devices_key,
                          engine: str, use_pallas=None):
    """Distributed C2C on the df64 (double-float) engine: same collective
    structure as _build_distributed, all local compute in dd arithmetic
    (4 f32 arrays — the same HBM/ICI bytes as 2 f64 arrays). The column
    pass runs the fused dd column kernel per chunk with shard-base-aware
    T1 slices; the row transforms run the full fft_rows_dd pipeline
    (Ozaki MXU two-pass when the engine is df64-oz and shapes fit)."""
    from ..ops.fourstep import _use_pallas, fft_rows_dd
    from ..ops.df64 import dd_cmul, stockham_axis2_dd

    mesh = default_mesh(axis_name, devices=list(devices_key))
    n1, n2 = _factor_dd(n, d)
    dd_leaf = engine.split("-", 1)[1] if "-" in engine else None
    if dd_leaf not in ("split", "fused", "xla"):
        dd_leaf = None

    row_plan = _dd_dist_state(n1, n2, leaf_limit, engine)[0]

    def local_step(re_l, im_l, tables, corrs, col_t1, col_t2):
        dev = jax.lax.axis_index(axis_name)
        arrs = _dd_split4(re_l, im_l)
        # 1. to column shard (N1, N2/D) — 4 all_to_alls (dd bytes ==
        # f64 bytes; chunk pipelining below overlaps the col->row side)
        cs = [_row_to_col(a, n1, n2, d, axis_name) for a in arrs]
        local_cols = n2 // d
        col_base = dev * local_cols
        tcol = int(col_t2[0].shape[1])
        # 2+3+4. chunked column DFT + global dd correction + col->row.
        # Chunk count: the overlap heuristic, raised until each chunk
        # fits the fused kernel's slab cap (ccols/T <= 1024).
        block_bytes = 4 * n1 * local_cols * 4
        chunks = _chunk_count(block_bytes, local_cols)
        ccols = local_cols // chunks
        while ccols % tcol == 0 and ccols // tcol > 1024:
            chunks *= 2
            ccols = local_cols // chunks
        aligned = ccols % tcol == 0 and local_cols % tcol == 0
        fused_ok = (
            aligned
            and 8 <= n1 <= 1024
            and ccols // tcol <= 1024
            and _use_pallas(use_pallas)
        )
        parts = []
        for c in range(chunks):
            sl = slice(c * ccols, (c + 1) * ccols)
            chunk = [a[:, sl] for a in cs]
            fused = None
            if fused_ok:
                from ..ops.pallas_dd import ddcol_pallas

                jg0 = col_base // tcol + c * (ccols // tcol)
                t1c = tuple(
                    jax.lax.dynamic_slice_in_dim(
                        a, jg0, ccols // tcol, axis=1
                    )
                    for a in col_t1
                )
                fused = ddcol_pallas(*chunk, t1c, col_t2, n1)
            if fused is not None:
                z = fused
            else:
                z = stockham_axis2_dd(*chunk, tables, n1)
                if aligned:
                    jg0 = col_base // tcol + c * (ccols // tcol)
                    t1c = [
                        jax.lax.dynamic_slice_in_dim(
                            a, jg0, ccols // tcol, axis=1
                        )
                        for a in col_t1
                    ]
                    shape = (n1, ccols // tcol, tcol)
                    z = [a.reshape(shape) for a in z]
                    z = dd_cmul(*z, *(a[:, :, None] for a in t1c))
                    z = dd_cmul(*z, *(a[:, None, :] for a in col_t2))
                    z = [a.reshape(n1, ccols) for a in z]
                else:  # unaligned tiny shapes: in-graph f64-trig dd corr
                    cdd = _dd_corr_trig(
                        n1, n, col_base + c * ccols, ccols
                    )
                    z = dd_cmul(*z, *cdd)
            parts.append(
                tuple(
                    _col_to_row(a, n1, ccols * d, d, axis_name) for a in z
                )
            )
        if chunks == 1:
            rows = parts[0]
        else:
            rows = tuple(
                jnp.concatenate(
                    [p[i].reshape(n1 // d, d, ccols) for p in parts],
                    axis=2,
                ).reshape(n1 // d, n2)
                for i in range(4)
            )
        # 5. row FFTs over i2 (size N2) — full dd/oz engine pipeline
        out4 = fft_rows_dd(*rows, row_plan, tables, corrs,
                           use_pallas=use_pallas, dd_leaf=dd_leaf)
        if permuted_output:
            flat = tuple(a.reshape(-1) for a in out4)
        else:
            # 6. global transpose D[k1,k2] -> (N2, N1) natural order
            flat = []
            for a in out4:
                ar = a.reshape(n1 // d, d, n2 // d)
                br = jax.lax.all_to_all(ar, axis_name, split_axis=1,
                                        concat_axis=0, tiled=True)
                flat.append(
                    jnp.swapaxes(br.reshape(n1, n2 // d), 0, 1).reshape(-1)
                )
        out_re = flat[0].astype(jnp.float64) + flat[1].astype(jnp.float64)
        out_im = flat[2].astype(jnp.float64) + flat[3].astype(jnp.float64)
        if scale:
            inv = jnp.asarray(1.0 / n, jnp.float64)
            out_re = out_re * inv
            out_im = out_im * inv
        return out_re, out_im

    shard = P(axis_name)
    repl = P()
    mapped = jax.shard_map(
        lambda re, im, tabs, corrs, t1, t2: local_step(
            re.reshape(n1 // d, n2), im.reshape(n1 // d, n2),
            tabs, corrs, t1, t2
        ),
        mesh=mesh,
        in_specs=(shard, shard, repl, repl, repl, repl),
        out_specs=(shard, shard),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(re, im, tabs, corrs, t1, t2):
        return mapped(re, im, tabs, corrs, t1, t2)

    return run, mesh


def fft_distributed(
    reals,
    imags,
    direction,
    planner,
    *,
    mesh: Mesh | None = None,
    axis_name: str = "x",
    permuted_output: bool = False,
    permuted_input: bool = False,
):
    """Distributed C2C FFT of one length-n transform sharded over a mesh.

    ``planner`` supplies dtype and twiddle tables (PlannerDit32/64 built
    for n). Input arrays are 1-D of length n (host or device); they are
    placed contiguously sharded over the mesh axis. Forward/inverse follow
    the same swap-trick + 1/N contract as the single-chip API.

    ``permuted_output=True`` returns the spectrum in the digit-permuted
    D[k1, k2] layout (2 all_to_alls instead of 3); ``permuted_input=True``
    consumes that same layout (from a permuted forward on the SAME mesh
    size and planner) and returns natural order — so a convolution-style
    forward -> pointwise multiply -> inverse round trip costs 4
    collectives instead of 6. The two flags are mutually exclusive.
    """
    direction = _coerce_direction(direction)
    if permuted_input and permuted_output:
        raise ValueError(
            "permuted_input and permuted_output are mutually exclusive"
        )
    mesh = default_mesh(axis_name) if mesh is None else mesh
    d = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    dtype = planner.dtype
    reals = jnp.asarray(reals, dtype)
    imags = jnp.asarray(imags, dtype)
    n = int(reals.shape[-1])
    ensure_power_of_two(n)
    if planner.n != n:
        raise NonPowerOfTwoError(
            f"planner is for size {planner.n} but input has size {n}"
        )
    leaf_limit = planner.options.leaf_fft_size
    scale = direction is Direction.Reverse
    # Fast-f64 engine dispatch (round-4 verdict: the single-chip df64/oz
    # wins must reach the sharded path too). The permuted layouts keep
    # the native-f64 pipeline for now — the convolution round trip is a
    # layout feature, not an arithmetic-bound one.
    engine = (
        (planner.options.f64_engine or "native")
        if dtype == np.float64
        else "native"
    )
    if engine.startswith("df64") and not (permuted_input or permuted_output):
        run, mesh = _build_distributed_dd(
            n, d, axis_name, leaf_limit, scale, permuted_output,
            tuple(mesh.devices.flat), engine,
            planner.options.use_pallas,
        )
        n1, n2 = _factor_dd(n, d)
        _plan, tabs, corrs, t1, t2 = _dd_dist_state(
            n1, n2, leaf_limit, engine
        )
        args = (tabs, corrs, t1, t2)
    else:
        run, mesh = _build_distributed(
            n, d, axis_name, leaf_limit, scale, permuted_output,
            tuple(mesh.devices.flat),
            planner.options.use_pallas, planner.options.leaf_kernel,
            planner.options.col_engine, permuted_input,
        )
        args = (planner.fast_tables, planner.leaf_corrs)
    sharding = NamedSharding(mesh, P(axis_name))
    reals = jax.device_put(reals, sharding)
    imags = jax.device_put(imags, sharding)
    # tiny leaf-correction tables + radix tables are replicated
    if direction is Direction.Forward:
        return run(reals, imags, *args)
    out_re, out_im = run(imags, reals, *args)
    return out_im, out_re
