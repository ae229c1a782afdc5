"""Fused dd (double-float) kernels on the MXU via Ozaki bf16 slices.

The df64 engine's two passes were both VPU-bound (round-4 breakdown at
2^24 on v5e: dd column kernel 15.3 ms, dd XLA leaf 19.0 ms, against a
~0.6 ms HBM floor per pass) because every dd multiply-add costs ~10-25
serial VPU ops. These kernels move the contractions onto the MXU with
the error-free slice scheme of ops/ozaki.py and mirror the f32 fused
two-pass pipeline's geometry (ops/pallas_col.out3d + ops/pallas_leaft):

    ozcol   column DFT over n1 as radix-R DIF (R = 4 or 16): an Ozaki
            F(n1/R) contraction per digit, dd phase twiddles, the
            cross-digit combine as the register-resident dd DFT
            (df64._dft_regs_dd), the dd split correction, and output
            in the (A, n1, 128) relayout.
    ozleaft the whole length-n2 row FFT (two Ozaki contractions around
            a dd twiddle correction), writing (M, A, RT) tiles of the
            final flat output — the four-step transpose is the output
            BlockSpec, exactly as in the f32 leafT kernel.

Two HBM round trips total for one split level of an f64-class
transform, with all heavy arithmetic as bf16 integer-slice matmuls.
Accuracy: ~1e-11 rel L2 per stage (slice truncation; ops/ozaki.py),
inside the 1e-10 contract — the pure-VPU dd path (ops/pallas_dd.py)
remains for callers wanting ~1e-14.

Reference analog: none (CPUs have f64 ALUs); this is the same
"fuse while resident + use the fast unit exactly" economics as the
reference's codelets (/root/reference/src/kernels/codelets.rs:24-32)
applied to emulated precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .df64 import (
    _dft_regs_dd,
    _quick_renorm,
    dd_cmul,
    split_hi_lo,
)
from .ozaki import (
    NSLICES,
    oz_cmatmul_dd,
    oz_slice_matrix_host,
)
from .pallas_util import dim_semantics, vmem_limit_bytes

__all__ = [
    "OZ_COL_TILE",
    "OZ_ROW_TILE",
    "ozcol_radix",
    "ozcol_tables_host",
    "ozleaft_tables_host",
    "ozcol_pallas",
    "ozleaft_pallas",
]

#: Lane-slab width of the oz column kernel (dd blocks are 4 f32 arrays;
#: 256 keeps in+out+T2 VMEM of a 2048-deep column at ~55 MiB).
OZ_COL_TILE = 256

#: Rows of the n1 axis per ozleaft program (output minor-dim tiling).
OZ_ROW_TILE = 128

#: Stage-1 row sub-chunk of the leaf pipeline: the F(A) contraction +
#: dd twiddle run on (A, OZ_SUB*128)-lane pieces so the slice/tier
#: temporaries stay a fraction of the tile (the whole-tile form spilled
#: 121 MiB of registers at a = 64 on v5e). The chunk's minor reshape
#: dims stay >= 128 (Mosaic's shape-cast floor) because the lane count
#: OZ_SUB * 128 and the (a, sub, m) views keep m = 128 minor.
OZ_SUB = 32

#: Stage-2 row chunk: the F(128) NT-contraction runs on
#: (OZ_S2_ROWS, 128) row pieces of the assembled (A*RT, 128) value;
#: per-chunk outputs concatenate along the output's lane axis in
#: natural k_A-major order.
OZ_S2_ROWS = 2048

_M = 128  # second leaf factor (lane axis)


def ozcol_radix(n1: int) -> int:
    """Digit radix of the oz column kernel. Pinned to 4: Mosaic compile
    time grows superlinearly with the kernel's unrolled dot count
    (round-4 probes: 15 dots/digit x 4 digits ~ 4-6 min once per shape,
    cached; x 8 digits is unusable), so the deeper-column MAC saving of
    higher radices is not worth it."""
    return 4


def _dft_slices_host(m: int):
    """Ozaki slice sets (fr, fi, fs) of the m x m DFT matrix."""
    k = np.arange(m, dtype=np.int64)
    ang = -2.0 * np.pi * ((np.outer(k, k) % m).astype(np.float64)) / m
    fr = np.cos(ang)
    fi = np.sin(ang)
    return (
        oz_slice_matrix_host(fr),
        oz_slice_matrix_host(fi),
        oz_slice_matrix_host(fr + fi, bound=2.0),
    )


@functools.lru_cache(maxsize=16)
def ozcol_tables_host(n1: int, n2: int):
    """Host tables for the oz column kernel, flattened in operand order:
    F(n1/R) slice sets (3 * NSLICES bf16 arrays), the dd radix-R DIF
    phase table W_{n1}^{p*k_m} as (m, R) dd 4-tuple, and the dd
    split-correction factors T1 (n1, n2/T) / T2 (n1, T) 4-tuples.
    Exact f64 angles, Dekker splits (the dd accuracy contract)."""
    r = ozcol_radix(n1)
    m = n1 // r
    fa = _dft_slices_host(m)
    km = np.arange(m, dtype=np.int64)[:, None]
    p = np.arange(r, dtype=np.int64)[None, :]
    ang = -2.0 * np.pi * ((km * p) % n1).astype(np.float64) / n1
    phase = split_hi_lo(np.cos(ang)) + split_hi_lo(np.sin(ang))
    n = n1 * n2
    t = min(OZ_COL_TILE, n2)
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    j = np.arange(n2 // t, dtype=np.float64)[None, :]
    c = np.arange(t, dtype=np.float64)[None, :]
    ang1 = (-2.0 * np.pi / n) * (k1 * (j * t))
    ang2 = (-2.0 * np.pi / n) * (k1 * c)
    t1 = split_hi_lo(np.cos(ang1)) + split_hi_lo(np.sin(ang1))
    t2 = split_hi_lo(np.cos(ang2)) + split_hi_lo(np.sin(ang2))
    return (
        fa[0] + fa[1] + fa[2]
        + tuple(np.float32(a) for a in phase)
        + tuple(np.float32(a) for a in t1)
        + tuple(np.float32(a) for a in t2)
    )


@functools.lru_cache(maxsize=16)
def ozleaft_tables_host(n2: int):
    """Host tables for the oz leafT kernel, flattened in operand order:
    F(A) and F(128) slice sets plus the inner correction
    W_{n2}^{k_A * i_M} as an (A, 128) dd 4-tuple."""
    a = n2 // _M
    fa = _dft_slices_host(a)
    fm = _dft_slices_host(_M)
    k1 = np.arange(a, dtype=np.float64)[:, None]
    i2 = np.arange(_M, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * (k1 * i2) / float(n2)
    corr = split_hi_lo(np.cos(ang)) + split_hi_lo(np.sin(ang))
    return (
        fa[0] + fa[1] + fa[2] + fm[0] + fm[1] + fm[2]
        + tuple(np.float32(c) for c in corr)
    )


def _dot_l(a, b):
    """lhs-side slice contraction: (K, D) x (D, C) -> (K, C)."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_nt(a, b):
    """NT slice contraction: (K, D) x (R, D) -> (K, R)."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------- oz column
def _ozcol_kernel(n1, r, t, nf, *refs):
    from jax.experimental import pallas as pl

    re_h, re_l, im_h, im_l = refs[:4]
    rest = list(refs[4:])
    data = tuple(x[0] for x in (re_h, re_l, im_h, im_l))

    fr = tuple(x[:] for x in rest[:nf])
    fi = tuple(x[:] for x in rest[nf:2 * nf])
    fs = tuple(x[:] for x in rest[2 * nf:3 * nf])
    (prh, prl, pih, pil) = (x[:] for x in rest[3 * nf:3 * nf + 4])
    (t1rh, t1rl, t1ih, t1il) = rest[3 * nf + 4:3 * nf + 8]
    (t2rh, t2rl, t2ih, t2il) = (x[:] for x in rest[3 * nf + 8:3 * nf + 12])
    orefs = rest[3 * nf + 12:]
    m = n1 // r
    # Per-digit Ozaki contractions on f32 sub-slices of the block.
    # (Alternatives probed on v5e: a lane-concat into one batched dot is
    # rejected by tpu.concatenate on offset layouts; slicing once and
    # taking strided bf16 sublane picks per digit compiles SLOWER than
    # re-slicing per digit — strided sub-16-sublane bf16 relayouts are
    # Mosaic's worst case.)
    x3 = [v.reshape(m, r, t) for v in data]
    us = []
    for p in range(r):
        tdd = oz_cmatmul_dd(
            fr, fi, fs,
            (x3[0][:, p, :], x3[1][:, p, :]),
            (x3[2][:, p, :], x3[3][:, p, :]),
            _dot_l, axis=0, nslices=nf,
        )
        # DIF phase W_{n1}^{p * k_m}: static lane slice of the (m, R) table
        us.append(dd_cmul(
            *tdd,
            prh[:, p:p + 1], prl[:, p:p + 1],
            pih[:, p:p + 1], pil[:, p:p + 1],
        ))
    # cross-digit combine: register-resident dd DFT over the R digits
    # (constant twiddles; outputs lazy — the T1 cmul renormalizes)
    ys = _dft_regs_dd(us)
    b4 = [
        jnp.concatenate([y[comp] for y in ys], axis=0) for comp in range(4)
    ]
    # T1 column select by lane mask (Mosaic: no dynamic lane indexing)
    j = pl.program_id(1)
    csel = jax.lax.broadcasted_iota(jnp.int32, t1rh.shape, 1) == j
    zero = jnp.float32(0.0)

    def col(ref):
        return jnp.sum(
            jnp.where(csel, ref[:], zero), axis=1, keepdims=True
        )

    v = dd_cmul(*b4, col(t1rh), col(t1rl), col(t1ih), col(t1il))
    v = dd_cmul(*v, t2rh, t2rl, t2ih, t2il)
    for comp in range(4):
        for g in range(t // _M):
            orefs[comp][0, g] = v[comp][:, g * _M:(g + 1) * _M]


@functools.lru_cache(maxsize=16)
def _build_ozcol(n1: int, n2: int, batch: int, nf: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = ozcol_radix(n1)
    t = min(OZ_COL_TILE, n2)
    m = n1 // r
    grid = (batch, n2 // t)
    data_specs = [
        pl.BlockSpec(
            (1, n1, t), lambda b, j: (b, b * 0, j),
            memory_space=pltpu.VMEM,
        )
    ] * 4
    out_spec = pl.BlockSpec(
        (1, t // _M, n1, _M), lambda b, j: (b, j, b * 0, b * 0),
        memory_space=pltpu.VMEM,
    )
    mat = lambda u, v: pl.BlockSpec(
        (u, v), lambda b, j: (b * 0, b * 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        data_specs
        + [mat(m, m)] * (3 * nf)
        + [mat(m, r)] * 4
        + [mat(n1, n2 // t)] * 4
        + [mat(n1, t)] * 4
    )
    return pl.pallas_call(
        functools.partial(_ozcol_kernel, n1, r, t, nf),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch, n2 // _M, n1, _M), jnp.float32)
            for _ in range(4)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 45 * batch * n1 * n2 * m,
            bytes_accessed=8 * batch * n1 * n2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(2),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def ozcol_pallas(rh, rl, ih, il, tabs, n1: int):
    """dd column DFT over axis -2 of (..., n1, n2) + dd split correction,
    contractions on the MXU via bf16 slices, output in the (A, n1, 128)
    relayout for ozleaft_pallas. ``tabs`` = device arrays in
    ozcol_tables_host's flat order (planner state). Returns None when
    the shape does not fit."""
    n2 = rh.shape[-1]
    batch = rh.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    r = ozcol_radix(n1)
    t = min(OZ_COL_TILE, n2)
    if n1 % r != 0 or not 32 <= n1 // r <= 512 or n2 % t != 0:
        return None
    if n2 % _M != 0 or rh.dtype != jnp.float32:
        return None
    call = _build_ozcol(n1, n2, b, NSLICES)
    shape = (b, n1, n2)
    outs = call(
        rh.reshape(shape), rl.reshape(shape), ih.reshape(shape),
        il.reshape(shape), *tabs
    )
    full = batch + (n2 // _M, n1, _M)
    return tuple(o.reshape(full) for o in outs)


# ---------------------------------------------------------------- oz leafT
def _ozleaft_kernel(a, rt, nf, *refs):
    re_h, re_l, im_h, im_l = refs[:4]
    rest = refs[4:]
    fa_r = tuple(x[:] for x in rest[:nf])
    fa_i = tuple(x[:] for x in rest[nf:2 * nf])
    fa_s = tuple(x[:] for x in rest[2 * nf:3 * nf])
    fm_r = tuple(x[:] for x in rest[3 * nf:4 * nf])
    fm_i = tuple(x[:] for x in rest[4 * nf:5 * nf])
    fm_s = tuple(x[:] for x in rest[5 * nf:6 * nf])
    (crh, crl, cih, cil) = (x[:] for x in rest[6 * nf:6 * nf + 4])
    orefs = rest[6 * nf + 4:]
    m = _M
    sub = min(OZ_SUB, rt)
    # stage 1 (chunked over row sub-tiles): t = F(A) @ x over i_A, then
    # the dd inner twiddle u = t * W_{n2}^{k_A * i_M}
    vs = [[] for _ in range(4)]
    for c0 in range(0, rt, sub):
        x = [ref[0, :, c0:c0 + sub, :].reshape(a, sub * m)
             for ref in (re_h, re_l, im_h, im_l)]
        tdd = oz_cmatmul_dd(
            fa_r, fa_i, fa_s, (x[0], x[1]), (x[2], x[3]),
            _dot_l, axis=0, nslices=nf,
        )
        sh3 = (a, sub, m)
        v = dd_cmul(
            tdd[0].reshape(sh3), tdd[1].reshape(sh3),
            tdd[2].reshape(sh3), tdd[3].reshape(sh3),
            crh[:, None, :], crl[:, None, :],
            cih[:, None, :], cil[:, None, :],
        )
        for comp in range(4):
            vs[comp].append(v[comp])
    v2 = [
        (vs[comp][0] if len(vs[comp]) == 1
         else jnp.concatenate(vs[comp], axis=1)).reshape(a * rt, m)
        for comp in range(4)
    ]
    # stage 2 (chunked over output lane groups): w = F(M) `NT` u over
    # i_M — the output (k_M, rows) chunks are k_A-major, so axis-1
    # concatenation is already the transposed tile's natural layout
    rows = a * rt
    s2 = min(OZ_S2_ROWS, rows)
    ws = [[] for _ in range(4)]
    for r0 in range(0, rows, s2):
        vc = [y[r0:r0 + s2, :] for y in v2]
        w = oz_cmatmul_dd(
            fm_r, fm_i, fm_s, (vc[0], vc[1]), (vc[2], vc[3]),
            _dot_nt, axis=1, nslices=nf,
            sigma_map=lambda s, _r=s2: s.reshape(1, _r),
        )
        for comp in range(4):
            ws[comp].append(w[comp])
    for comp in range(4):
        w_full = (ws[comp][0] if len(ws[comp]) == 1
                  else jnp.concatenate(ws[comp], axis=1))
        orefs[comp][0] = w_full.reshape(m, a, rt)


@functools.lru_cache(maxsize=16)
def _build_ozleaft(a: int, n1: int, batch: int, rt: int, nf: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = _M
    grid = (batch, n1 // rt)
    in_spec = pl.BlockSpec(
        (1, a, rt, m), lambda b, p: (b, b * 0, p, b * 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, m, a, rt), lambda b, p: (b, b * 0, b * 0, p),
        memory_space=pltpu.VMEM,
    )
    mat = lambda u, v: pl.BlockSpec(
        (u, v), lambda b, p: (b * 0, b * 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [in_spec] * 4
        + [mat(a, a)] * (3 * nf)
        + [mat(m, m)] * (3 * nf)
        + [mat(a, m)] * 4
    )
    return pl.pallas_call(
        functools.partial(_ozleaft_kernel, a, rt, nf),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch, m, a, n1), jnp.float32)
            for _ in range(4)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 45 * batch * n1 * a * m * (a + m),
            bytes_accessed=8 * batch * n1 * a * m * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(2),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def ozleaft_pallas(crh, crl, cih, cil, tabs, n1: int):
    """dd row FFTs of length n2 = A * 128 over the oz column kernel's
    relayout, with the four-step output transpose fused into the output
    BlockSpec (dd counterpart of ops/pallas_leaft.leaft_pallas).

    ``tabs``: device arrays in ozleaft_tables_host's flat order. Returns
    a dd 4-tuple of flat (..., n) arrays in final natural order, or None
    when shapes do not fit (the caller falls back)."""
    a, m = crh.shape[-3], crh.shape[-1]
    if crh.shape[-2] != n1 or m != _M:
        return None
    if n1 % OZ_ROW_TILE != 0 or n1 < OZ_ROW_TILE:
        return None
    # a = 64 keeps the 4-array in/out blocks at 16 MiB each — the
    # double-buffered ceiling; a = 128 blocks would need 128 MiB.
    if not 8 <= a <= 64:
        return None
    if crh.dtype != jnp.float32:
        return None
    batch = crh.shape[:-3]
    b = int(np.prod(batch)) if batch else 1
    call = _build_ozleaft(a, n1, b, OZ_ROW_TILE, NSLICES)
    shape = (b, a, n1, m)
    outs = call(
        crh.reshape(shape), crl.reshape(shape), cih.reshape(shape),
        cil.reshape(shape), *tabs
    )
    n = n1 * a * m
    return tuple(o.reshape(batch + (n,)) for o in outs)
