"""Fused Pallas column-FFT kernel: the four-step's column pass + split
twiddle correction in ONE HBM round trip.

Round-1 profiling showed the f32 2^24 four-step spends ~5.3 ms of 6.9 ms
in the column Stockham pass expressed as XLA ops: each radix-16 step is
its own HBM pass (plus layout copies from the slice/stack restacking), so
the column transform alone makes ~6 round trips over the 128 MB working
set. This kernel is the TPU answer the reference applies at L1 scale with
its fused codelets (/root/reference/src/kernels/codelets.rs:24-32 — fuse
stages while the block is resident): a grid program loads a full-height
(n1, TILE_L) lane slab into VMEM, runs *all* radix-16 Stockham steps of
the size-n1 column DFT on the VPU while it is resident, applies the
four-step twiddle correction W_n^(k1*i2), and writes the slab back once.
HBM traffic drops to the algorithmic minimum (read + write).

The twiddle correction is factored per lane slab: for i2 = j*T + c,
W_n^(k1*i2) = T1[k1, j] * T2[k1, c], so program j needs one column of T1
(blocked input) and the shared (n1, T) T2 table (VMEM-resident constant
across programs). Math and tables are shared with the XLA path
(ops/stockham.py); the kernel simply calls `stockham_axis2` on VMEM
values, so the two lowerings are the same traced program.

f32 only — Mosaic has no f64; the f64 column pass stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stockham import radix_schedule, stockham_axis2
from .pallas_util import dim_semantics, vmem_limit_bytes

__all__ = [
    "colfft_pallas",
    "colfft_pallas_nocorr",
    "col_split_tables_host",
    "col_mxu_tables_host",
    "col_r4_tables_host",
    "col_rn_tables_host",
    "col_r16_tables_host",
    "col_tile",
]

#: Keep one in-block (n1 * T f32) at <= 512 KiB so in+out, re+im, double
#: buffering and the T2 table stay well inside VMEM.
_BLOCK_ELEMS = 1 << 17

#: Measured default for the fused column engine (Options.col_engine =
#: None and no PHASTFT_TPU_COL_ENGINE env var); set from the round-3
#: on-device race at 2^24 f32 / n1=256 on v5e (scratch/r3/
#: race_results.json): r4mxu 3.224 ms < mxu 3.625 ms < stockham
#: 3.772 ms end-to-end. The radix-4 DIF + dense F(64) contraction
#: keeps the MXU busy where the in-kernel Stockham steps were
#: VPU-serialized.
DEFAULT_COL_ENGINE = "r4mxu"


def col_tile(n1: int, n2: int) -> int:
    """Lane-slab width for the column kernel (power of two)."""
    t = max(128, min(512, _BLOCK_ELEMS // max(n1, 1)))
    return min(t, n2)


def col_tile3d(n1: int, n2: int) -> int:
    """Lane-slab width for the out3d (relayout-output) column mode.

    Wider than col_tile for deep columns: measured on v5e at 2^24, a
    (2048, 128) block's 512-byte contiguous rows run the pass at ~half
    the HBM efficiency of (n1, 512) slabs (1.97 ms vs 1.0 ms), so the
    3-d mode keeps t = 512 up to 4 MiB blocks — VMEM affords it because
    the relayout output block (t/128, n1, 128) is fully contiguous in
    HBM."""
    t = max(128, min(512, (1 << 20) // max(n1, 1)))
    return min(t, n2)


@functools.lru_cache(maxsize=64)
def col_split_tables_host(n1: int, n2: int, dtype_name: str,
                          t: int | None = None):
    """The lane-local half of the split correction, factored on the
    kernel's slab width T: W_n^(k1*(j*T+c)) = T1[k1, j] * T2[k1, c].
    Only T2 (shared by every program) is a table; the per-program T1
    column is generated in-kernel from the program id (exact integer
    phase + split-angle trig). Exact f64 angles, one cast (the
    reference's twiddle-accuracy contract, src/planner.rs:148-159).
    ``t`` overrides the slab width (the out3d mode uses col_tile3d)."""
    dtype = np.dtype(dtype_name)
    n = n1 * n2
    if t is None:
        t = col_tile(n1, n2)
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    c = np.arange(t, dtype=np.float64)[None, :]
    ang2 = (-2.0 * np.pi / n) * (k1 * c)
    return np.cos(ang2).astype(dtype), np.sin(ang2).astype(dtype)


@functools.lru_cache(maxsize=64)
def col_mxu_tables_host(n1: int, dtype_name: str):
    """F(n1) with the Karatsuba sum for the dense-MXU column engine."""
    from .mxu import dft_matrix_host

    fr, fi = dft_matrix_host(n1, dtype_name)
    return fr, fi, fr + fi


@functools.lru_cache(maxsize=64)
def col_rn_tables_host(n1: int, radix: int, dtype_name: str):
    """Tables for the radix-R DIT-residue + F(n1/R) column engine: the
    R-th DFT matrix with its Karatsuba sum, plus the phase correction
    W_{n1}^{p * k_m} as an (n1/R, R) table (lane-sliced per digit
    in-kernel). Exact f64 angles, one cast. Vs r4mxu, R = 16 cuts the
    MXU MACs/element another 4x — the lever that makes deep column
    factors (n1 = 1024/2048, the fused two-pass shapes) affordable —
    at the cost of an in-register R-point DFT on the VPU; R = 8 trades
    half that VPU combine back for 2x the MACs."""
    from .mxu import dft_matrix_host

    m = n1 // radix
    gr, gi = dft_matrix_host(m, dtype_name)
    dtype = np.dtype(dtype_name)
    km = np.arange(m, dtype=np.int64)[:, None]
    p = np.arange(radix, dtype=np.int64)[None, :]
    ang = -2.0 * np.pi * ((km * p) % n1).astype(np.float64) / n1
    return gr, gi, gr + gi, np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def col_r16_tables_host(n1: int, dtype_name: str):
    """Radix-16 instance of ``col_rn_tables_host`` (the default deep-
    column engine's tables)."""
    return col_rn_tables_host(n1, 16, dtype_name)


@functools.lru_cache(maxsize=64)
def col_r4_tables_host(n1: int, dtype_name: str):
    """Tables for the radix-4 DIF + F(n1/4) column engine: the quarter
    DFT matrix with its Karatsuba sum, plus the DIF phase correction
    W_{n1}^{p * k_m} as a (4, n1/4) table. Exact f64 angles, one cast."""
    from .mxu import dft_matrix_host

    m = n1 // 4
    gr, gi = dft_matrix_host(m, dtype_name)
    dtype = np.dtype(dtype_name)
    km = np.arange(m, dtype=np.int64)[:, None]
    p = np.arange(4, dtype=np.int64)[None, :]
    # (m, 4) layout so the kernel takes static lane slices (a (4, m) row
    # pick + reshape to (m, 1) would be a Mosaic-hostile relayout)
    ang = -2.0 * np.pi * ((km * p) % n1).astype(np.float64) / n1
    return gr, gi, gr + gi, np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _iota_tables(n1: int):
    """Stockham step twiddles generated in-kernel: (q, 1, 1) iota + trig.

    Mosaic cannot shape-cast a (q,) vector to (q, 1, 1) (so VMEM table
    operands cannot be re-shaped for stockham_axis2's broadcast), but
    `broadcasted_iota` produces the 3-D layout directly and sin/cos are
    native VPU transcendentals. q*(R-1) values per step — negligible
    compute — and the twiddle angles |j*p/cur| < 1 keep f32 trig at the
    ~1-ulp level, inside the f32 path's error budget."""
    tables = {}
    cur = n1
    for radix in radix_schedule(n1):
        q = cur // radix
        if q > 1 and (cur, radix) not in tables:
            p = jax.lax.broadcasted_iota(jnp.int32, (q, 1, 1), 0).astype(
                jnp.float32
            )
            entry = []
            for j in range(1, radix):
                ang = p * np.float32(-2.0 * np.pi * j / cur)
                entry.append((jnp.cos(ang), jnp.sin(ang)))
            tables[(cur, radix)] = tuple(entry)
        cur //= radix
    return tables


def _t1_column(n1: int, n: int, t: int):
    """This program's T1 correction column W_n^(k1 * j * T) as (n1, 1)
    cos/sin pairs, from exact integer phase arithmetic.

    The phase k1*j*T mod n is computed in i32 (exact: every product is
    < n <= 2^30), then split into 15-bit halves so each half converts to
    f32 exactly; cos/sin of the two sub-angles are combined with the
    angle-addition identity, keeping the twiddle at the ~1-ulp level a
    f64-computed table would give. Mosaic rejects both (n1, 1) block
    specs and dynamic lane slices of a VMEM table, so generating the
    column beats storing it."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    m = (k1 * (j * t)) & (n - 1)
    hi = (m >> 15).astype(jnp.float32)
    lo = (m & 0x7FFF).astype(jnp.float32)
    a = hi * np.float32(-2.0 * np.pi * (1 << 15) / n)
    b = lo * np.float32(-2.0 * np.pi / n)
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    return ca * cb - sa * sb, sa * cb + ca * sb


def _apply_split_corr(n1, n, t, out4, br, bi, t2r_ref, t2i_ref,
                      ore_ref, oim_ref):
    """Shared epilogue: T1 column (from the program id) then the T2 slab.

    ``out4``: write through the 4-d (out3d-mode) block (1, 1, n1, T) —
    the value is the same (n1, T) slab, only the BlockSpec (and hence
    the HBM landing spot) differs."""
    t1r, t1i = _t1_column(n1, n, t)
    ur = br * t1r - bi * t1i
    ui = br * t1i + bi * t1r
    t2r = t2r_ref[:]  # (n1, T)
    t2i = t2i_ref[:]
    vr = ur * t2r - ui * t2i
    vi = ur * t2i + ui * t2r
    if out4:
        # land the (n1, T) slab as T/128 contiguous (n1, 128) blocks of
        # the (A, n1, 128) relayout: static lane slices, and the whole
        # (T/128, n1, 128) output block is one contiguous HBM range
        for g in range(t // 128):
            ore_ref[0, g] = vr[:, g * 128:(g + 1) * 128]
            oim_ref[0, g] = vi[:, g * 128:(g + 1) * 128]
    else:
        ore_ref[0] = vr
        oim_ref[0] = vi


def _kernel(n1, n, t, out4, re_ref, im_ref, t2r_ref, t2i_ref,
            ore_ref, oim_ref):
    # the in-kernel transform is literally stockham_axis2 — same traced
    # program as the XLA path, twiddles from in-kernel iota + trig
    br, bi = stockham_axis2(re_ref[0], im_ref[0], _iota_tables(n1), n1)
    _apply_split_corr(n1, n, t, out4, br, bi, t2r_ref, t2i_ref,
                      ore_ref, oim_ref)


def _kernel_nocorr(n1, re_ref, im_ref, ore_ref, oim_ref):
    # bare column DFT (no split correction): the last pass of the
    # permuted-input distributed pipeline, where the twiddle was already
    # applied before the all_to_all
    br, bi = stockham_axis2(re_ref[0], im_ref[0], _iota_tables(n1), n1)
    ore_ref[0] = br
    oim_ref[0] = bi


@functools.lru_cache(maxsize=64)
def _build_nocorr(n1: int, n2: int, batch: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = col_tile(n1, n2)
    grid = (batch, n2 // t)
    data_spec = pl.BlockSpec(
        (1, n1, t), lambda b, j: (b, b * 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel_nocorr, n1),
        grid=grid,
        in_specs=[data_spec, data_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((batch, n1, n2), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * batch * n1 * n2 * len(radix_schedule(n1)),
            bytes_accessed=4 * batch * n1 * n2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(2),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def colfft_pallas_nocorr(re, im, n1: int):
    """Bare fused column DFT of size n1 along axis -2 of (..., n1, n2)
    f32 planar arrays (all radix steps VMEM-resident, no correction).
    Returns None when the shape does not fit."""
    n2 = re.shape[-1]
    batch = re.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    t = col_tile(n1, n2)
    if n1 < 8 or n1 > 2048 or n2 % t != 0 or n2 < t:
        return None
    if re.dtype != jnp.float32:
        return None
    call = _build_nocorr(n1, n2, b)
    ore, oim = call(re.reshape(b, n1, n2), im.reshape(b, n1, n2))
    shape = batch + (n1, n2)
    return ore.reshape(shape), oim.reshape(shape)


def mxu_precision():
    """f32 matmul precision for the in-kernel MXU engines: HIGHEST.

    Mosaic's dot lowering supports only DEFAULT and HIGHEST — the
    3-pass HIGH form raises NotImplementedError (probed on v5e,
    round 4), so the cheaper-precision path is the explicit bf16x3
    slice contraction (ops/pallas_bf16x3.py-style manual splitting),
    not a precision flag. Kept as the single switch point."""
    return jax.lax.Precision.HIGHEST


def _dotp(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )


def _kernel_mxu(n1, n, t, out4, re_ref, im_ref, fr_ref, fi_ref, fs_ref,
                t2r_ref, t2i_ref, ore_ref, oim_ref):
    """Dense-MXU column engine: the size-n1 column DFT as one Karatsuba
    complex matmul contracting the sublane axis (the leaf kernel's
    step-1 pattern, which schedules at ~90% of the MXU bound where the
    in-kernel VPU Stockham does not)."""
    xr = re_ref[0]
    xi = im_ref[0]
    fr, fi, fs = fr_ref[:], fi_ref[:], fs_ref[:]
    p1 = _dotp(fr, xr)
    p2 = _dotp(fi, xi)
    p3 = _dotp(fs, xr + xi)
    _apply_split_corr(n1, n, t, out4, p1 - p2, p3 - p1 - p2,
                      t2r_ref, t2i_ref, ore_ref, oim_ref)


def _kernel_rn(n1, n, t, out4, radix, re_ref, im_ref, gr_ref, gi_ref,
               gs_ref, cr_ref, ci_ref, t2r_ref, t2i_ref, ore_ref,
               oim_ref):
    """Radix-R residue + F(n1/R) column engine: i1 = R*i_m + i_p, so the
    residue DFTs T_p = F(m) @ x[i_p::R] contract the MXU R times less
    than the dense engine; the cross-p combine X[k_m + m*k_p] =
    sum_p W_R^{p k_p} (W_{n1}^{p k_m} T_p) is the in-register R-point
    DFT (stockham._dft_regs, constant twiddles) and writes R
    contiguous sublane slabs (natural k1 order)."""
    from .stockham import _dft_regs

    m = n1 // radix
    gr, gi, gs = gr_ref[:], gi_ref[:], gs_ref[:]
    cr, ci = cr_ref[:], ci_ref[:]
    x3r = re_ref[0].reshape(m, radix, t)
    x3i = im_ref[0].reshape(m, radix, t)
    u = []
    for p in range(radix):
        xr = x3r[:, p, :]
        xi = x3i[:, p, :]
        p1 = _dotp(gr, xr)
        p2 = _dotp(gi, xi)
        p3 = _dotp(gs, xr + xi)
        tr = p1 - p2
        ti = p3 - p1 - p2
        # phase W_{n1}^{p * k_m}: static lane slice of the (m, R) table
        pr = cr[:, p:p + 1]
        pi = ci[:, p:p + 1]
        u.append((tr * pr - ti * pi, tr * pi + ti * pr))
    ys = _dft_regs(u)
    br = jnp.concatenate([y[0] for y in ys], axis=0)
    bi = jnp.concatenate([y[1] for y in ys], axis=0)
    _apply_split_corr(n1, n, t, out4, br, bi, t2r_ref, t2i_ref,
                      ore_ref, oim_ref)


def _kernel_r4(n1, n, t, out4, re_ref, im_ref, gr_ref, gi_ref, gs_ref,
               cr_ref, ci_ref, t2r_ref, t2i_ref, ore_ref, oim_ref):
    """Radix-4 DIF + F(n1/4) column engine: i1 = 4*i_m + i_p, so the
    quarter DFTs T_p = F(m) @ x[i_p::4] contract the MXU 4x less than the
    dense engine; the cross-p combine X[k_m + m*k_p] = sum_p W_4^{p k_p}
    (W_{n1}^{p k_m} T_p) is VPU adds and writes four contiguous sublane
    slabs (no interleave)."""
    m = n1 // 4
    gr, gi, gs = gr_ref[:], gi_ref[:], gs_ref[:]
    cr, ci = cr_ref[:], ci_ref[:]
    x3r = re_ref[0].reshape(m, 4, t)
    x3i = im_ref[0].reshape(m, 4, t)
    u = []
    for p in range(4):
        xr = x3r[:, p, :]
        xi = x3i[:, p, :]
        p1 = _dotp(gr, xr)
        p2 = _dotp(gi, xi)
        p3 = _dotp(gs, xr + xi)
        tr = p1 - p2
        ti = p3 - p1 - p2
        # DIF phase W_{n1}^{p * k_m}: static lane slice of the (m, 4) table
        pr = cr[:, p:p + 1]
        pi = ci[:, p:p + 1]
        u.append((tr * pr - ti * pi, tr * pi + ti * pr))
    (u0r, u0i), (u1r, u1i), (u2r, u2i), (u3r, u3i) = u
    e_r, e_i = u0r + u2r, u0i + u2i
    d_r, d_i = u0r - u2r, u0i - u2i
    g_r, g_i = u1r + u3r, u1i + u3i
    h_r, h_i = u1r - u3r, u1i - u3i
    br = jnp.concatenate(
        [e_r + g_r, d_r + h_i, e_r - g_r, d_r - h_i], axis=0
    )
    bi = jnp.concatenate(
        [e_i + g_i, d_i - h_r, e_i - g_i, d_i + h_r], axis=0
    )
    _apply_split_corr(n1, n, t, out4, br, bi, t2r_ref, t2i_ref,
                      ore_ref, oim_ref)


@functools.lru_cache(maxsize=64)
def _build(n1: int, n2: int, batch: int, engine: str = "stockham",
           n_total: int | None = None, out3d: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = col_tile3d(n1, n2) if out3d else col_tile(n1, n2)
    grid = (batch, n2 // t)
    # zeros in index maps are derived from the i32 program ids (see
    # ops/pallas_leaf.py: literal zeros become i64 under x64 mode and
    # Mosaic rejects the mixed signature)
    data_spec = pl.BlockSpec(
        (1, n1, t), lambda b, j: (b, b * 0, j), memory_space=pltpu.VMEM
    )
    if out3d:
        # the (n1, T) slab lands as T/128 (n1, 128) sub-blocks of the
        # (batch, A, n1, 128) relayout — the layout handshake with the
        # transposed-write leaf kernel (ops/pallas_leaft.py). The whole
        # (T/128, n1, 128) output block is one contiguous HBM range, and
        # the input keeps wide (>= 2 KiB-row) slabs — see col_tile3d.
        out_spec = pl.BlockSpec(
            (1, t // 128, n1, 128), lambda b, j: (b, j, b * 0, b * 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = (batch, n2 // 128, n1, 128)
    else:
        out_spec = data_spec
        out_shape = (batch, n1, n2)
    t2_spec = pl.BlockSpec(
        (n1, t), lambda b, j: (b * 0, b * 0), memory_space=pltpu.VMEM
    )
    mat_spec = lambda u, v: pl.BlockSpec(
        (u, v), lambda b, j: (b * 0, b * 0), memory_space=pltpu.VMEM
    )
    n = n_total if n_total is not None else n1 * n2
    if engine == "mxu":
        kernel = functools.partial(_kernel_mxu, n1, n, t, out3d)
        extra = [mat_spec(n1, n1)] * 3
        flops = 6 * batch * n1 * n1 * n2
    elif engine == "r4mxu":
        m = n1 // 4
        kernel = functools.partial(_kernel_r4, n1, n, t, out3d)
        extra = [mat_spec(m, m)] * 3 + [mat_spec(m, 4)] * 2
        flops = 6 * batch * n1 * (n1 // 4) * n2
    elif engine in ("r8mxu", "r16mxu", "r32mxu"):
        radix = int(engine[1:-3])
        m = n1 // radix
        kernel = functools.partial(_kernel_rn, n1, n, t, out3d, radix)
        extra = [mat_spec(m, m)] * 3 + [mat_spec(m, radix)] * 2
        flops = (6 * batch * n1 * m * n2
                 + 5 * (radix.bit_length() - 1) * batch * n1 * n2)
    else:
        kernel = functools.partial(_kernel, n1, n, t, out3d)
        extra = []
        # ~radix-16 Stockham: per element per step one in-register
        # DFT-16 (~4 cmul-adds) plus a twiddle cmul
        flops = 40 * batch * n1 * n2 * len(radix_schedule(n1))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[data_spec, data_spec, *extra, t2_spec, t2_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * batch * n1 * n2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(2),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )
    return call


def colfft_pallas(re, im, split_tabs, n1: int, engine=None,
                  n_total: int | None = None, out3d: bool = False):
    """Column DFT of size n1 along axis -2 of (..., n1, n2) f32 planar
    arrays, fused with the four-step split correction W_n^(k1*i2).

    ``split_tabs`` = (t2r, t2i) from ``col_split_tables_host`` (planner
    device arrays). ``engine`` is the resolved Options.col_engine (None
    = env default). ``n_total`` overrides the transform length used for
    the in-kernel T1 phase (distributed shards: the kernel sees only a
    local column block of a length-n_total transform, and the caller
    folds the shard's column-base offset into ``split_tabs``).
    ``out3d=True`` lands each program's (n1, T) slab as T/128 contiguous
    (..., A, n1, 128) blocks (A = n2/128) for the transposed-write leaf
    kernel; requires split tables built with t=col_tile3d. Returns None when
    the shape does not fit the kernel (caller falls back to the XLA
    path)."""
    import os

    n2 = re.shape[-1]
    batch = re.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    t = col_tile3d(n1, n2) if out3d else col_tile(n1, n2)
    if n1 < 8 or n1 > 2048 or n2 % t != 0 or n2 < t:
        return None
    if split_tabs[0].shape[1] != t:
        return None
    # Engine selection (Options.col_engine; None = the
    # PHASTFT_TPU_COL_ENGINE env var, default DEFAULT_COL_ENGINE): the
    # MXU variants trade VPU Stockham scheduling for systolic
    # contractions.
    # Engine tables are trace-time constants (small; promoted to planner
    # state if an engine becomes the default).
    if engine is None:
        engine = os.environ.get("PHASTFT_TPU_COL_ENGINE", "")
        if not engine:
            # depth-aware default: the MXU contraction depth m = n1/R
            # should be >= 128 (full systolic utilisation). r4mxu won
            # the round-3 race at n1 = 256 (m = 64); for the deep
            # columns of the fused two-pass shapes (n1 >= 1024) the
            # radix-16 engine keeps m >= 64 with 4x fewer MACs
            # (round-4: 1.13 ms vs 1.57 ms at (1024, 16384) on v5e).
            # Shallow columns (n1 < 128, the nested plans' outer
            # levels) take the dense F(n1) MXU engine: r4mxu's gate
            # excludes them and the in-kernel VPU Stockham fallback is
            # serialized (measured 21.4 ms for the n1=32 outer pass of
            # f32 2^26 on v5e, round 5 — the whole pass is ~2.5 ms of
            # HBM traffic).
            if n1 >= 1024:
                engine = "r16mxu"
            elif n1 >= 128:
                engine = DEFAULT_COL_ENGINE
            else:
                engine = "mxu"
    extra = ()
    if (
        engine in ("r8mxu", "r16mxu", "r32mxu")
        and n1 % int(engine[1:-3]) == 0
        and 8 <= n1 // int(engine[1:-3]) <= 1024
    ):
        extra = tuple(
            jnp.asarray(a)
            for a in col_rn_tables_host(n1, int(engine[1:-3]), "float32")
        )
    elif engine == "r4mxu" and n1 % 4 == 0 and 32 <= n1 // 4 <= 1024:
        extra = tuple(
            jnp.asarray(a) for a in col_r4_tables_host(n1, "float32")
        )
    elif engine == "mxu" and n1 <= 1024:
        extra = tuple(
            jnp.asarray(a) for a in col_mxu_tables_host(n1, "float32")
        )
    else:
        engine = "stockham"
    call = _build(n1, n2, b, engine, n_total, out3d)
    ore, oim = call(
        re.reshape(b, n1, n2), im.reshape(b, n1, n2), *extra, *split_tabs
    )
    if out3d:
        shape = batch + (n2 // 128, n1, 128)
    else:
        shape = batch + (n1, n2)
    return ore.reshape(shape), oim.reshape(shape)
