"""Fused Pallas leaf FFT: the whole leaf VMEM-resident, one HBM round trip.

The TPU-kernel counterpart of the reference's register-resident fused
codelets (/root/reference/src/kernels/codelets.rs:24-32): the reference
fuses the low DIT stages so one pass through L1 retires several stages;
this kernel fuses the *entire* leaf transform — both DFT matmuls, the
twiddle correction, and the output transpose — so one pass through VMEM
retires all log2(n) stages of a leaf. The XLA version (ops/mxu.py) runs
the same math as four dot kernels plus elementwise/transpose kernels,
each bouncing intermediates off HBM; here intermediates never leave VMEM.

Math per row (identical to ops/mxu.py, using the symmetry F^T = F):

    t  = F(n1) @ x          x viewed (n1, L), contraction on the MXU
    u  = t * W_n^{k1*i2}    correction table in natural (k1, i2) layout
    v  = u @ F(L)           second MXU contraction
    out = v^T flattened     natural order X[k1 + k2*n1]

Grid: one program per batch tile of TILE_ROWS rows, blocks shaped
(TILE_ROWS, n1, L) so the two minor dims always match the array (the
Mosaic tiling constraint); DFT matrices and the correction table are
broadcast to every program (constant index_map). f32 only — Mosaic has
no f64 (pallas_guide.md; f64 leaves use the VPU Stockham path). Matmuls
run at precision=HIGHEST: measured rel L2 error 1.0e-7 vs a f64 oracle,
matching the XLA MXU leaf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stockham import LANES
from .pallas_util import dim_semantics, vmem_limit_bytes

__all__ = [
    "leaf_fft_pallas",
    "leaf_fft_pallas3",
    "leaf_fft_pallas_hybrid",
    "pallas_available",
    "TILE_ROWS",
]

#: Rows per grid program. VMEM at n = 2^16 (n1 = 512), f32: in + out
#: blocks 4 * TILE_ROWS * 256 KiB, doubled by pipeline double-buffering,
#: + tables ~2.4 MiB + live intermediates -> ~12 MiB at TILE_ROWS = 4.
TILE_ROWS = 4


@functools.lru_cache(maxsize=8)
def pallas_available() -> bool:
    """Fused kernels need a real TPU backend (Mosaic); CPU tests and other
    platforms fall back to the XLA leaf."""
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel(re_ref, im_ref, f1r_ref, f1i_ref, f1s_ref, f2r_ref, f2i_ref,
            f2s_ref, cr_ref, ci_ref, ore_ref, oim_ref):
    from .pallas_col import mxu_precision

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )
    f1r, f1i, f1s = f1r_ref[:], f1i_ref[:], f1s_ref[:]
    f2r, f2i, f2s = f2r_ref[:], f2i_ref[:], f2s_ref[:]
    cr, ci = cr_ref[:], ci_ref[:]
    for r in range(re_ref.shape[0]):  # static unroll over the tile's rows
        xr = re_ref[r]
        xi = im_ref[r]
        # t = F(n1) @ x: Karatsuba 3-dot complex matmul (F is symmetric,
        # so left-multiplication contracts i1 with no transposes; the
        # fs = fr + fi sum matrices come precomputed from the planner)
        p1 = dot(f1r, xr)
        p2 = dot(f1i, xi)
        p3 = dot(f1s, xr + xi)
        tr = p1 - p2
        ti = p3 - p1 - p2
        # u = t * W_n^{k1*i2}
        ur = tr * cr - ti * ci
        ui = tr * ci + ti * cr
        # v = u @ F(L)
        q1 = dot(ur, f2r)
        q2 = dot(ui, f2i)
        q3 = dot(ur + ui, f2s)
        vr = q1 - q2
        vi = q3 - q1 - q2
        # natural order: X[k1 + k2*n1] -> row-major (k2, k1)
        ore_ref[r] = vr.T
        oim_ref[r] = vi.T


@functools.lru_cache(maxsize=64)
def _build(n1: int, batch: int, tile: int, lanes: int = LANES):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (batch // tile,)
    # index maps must return int32 everywhere: under jax_enable_x64 a
    # literal 0 becomes i64 and Mosaic refuses the mixed-type signature,
    # while a materialized jnp.int32(0) is a captured constant (also
    # rejected) — so zeros are derived from the i32 program index itself.
    in_spec = pl.BlockSpec((tile, n1, lanes), lambda i: (i, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, lanes, n1), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    mat_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (i * 0, i * 0),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            in_spec,
            in_spec,
            mat_spec(n1, n1),
            mat_spec(n1, n1),
            mat_spec(n1, n1),
            mat_spec(lanes, lanes),
            mat_spec(lanes, lanes),
            mat_spec(lanes, lanes),
            mat_spec(n1, lanes),
            mat_spec(n1, lanes),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, lanes, n1), jnp.float32),
            jax.ShapeDtypeStruct((batch, lanes, n1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n1 * lanes * (n1 + lanes),
            bytes_accessed=4 * batch * n1 * lanes * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(1),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def leaf_fft_pallas(re, im, pmats, n1: int, lanes: int = LANES):
    """DFT along the last axis of (..., n), n = n1 * lanes, as one fused
    Pallas kernel; returns None when the batch shape does not tile (the
    caller falls back to the XLA MXU leaf).

    ``pmats`` = (f1r, f1i, f1s, f2r, f2i, f2s, corr_re, corr_im) with the
    correction in natural (k1, i2) layout (fs = fr + fi, Karatsuba sums).
    ``lanes`` is the second DFT factor — 128 for the classic leaf, or the
    balanced factorization from mxu_leaf_tables2_host (e.g. 256 x 256 at
    n = 2^16, which minimizes the MXU-bound kernel's ~(n1 + lanes) MACs
    per element). Caller guarantees n1 > 1, f32, and a TPU backend."""
    batch = re.shape[:-1]
    n = n1 * lanes
    b = int(np.prod(batch)) if batch else 1
    if b % TILE_ROWS == 0:
        tile = TILE_ROWS
    elif b < TILE_ROWS:
        tile = b
    else:
        return None
    call = _build(n1, b, tile, lanes)
    ore, oim = call(re.reshape(b, n1, lanes), im.reshape(b, n1, lanes),
                    *pmats)
    return ore.reshape(batch + (n,)), oim.reshape(batch + (n,))


# ---------------------------------------------------------------------------
# Three-factor leaf: n = a * 4 * b with the middle radix-4 factor on the
# VPU. The two-factor kernel above is MXU-compute-bound with per-element
# cost ~ (na + nb) MACs; pulling a radix-4 out of the factorization (its
# twiddles are +-1, +-i — pure VPU adds) halves that to ~ (a + b) MACs
# (256 vs 512 at n = 2^16) while both remaining contractions keep a
# 128-deep (fully systolic-efficient) contraction dim. Tables from
# ops/mxu.mxu_leaf_tables3_host; index split i = i_a*(4b) + i_p*b + i_b,
# output k = k_a + a*k_p + 4a*k_b, emitted as a lane-block concat (no
# in-kernel interleave shuffles).
# ---------------------------------------------------------------------------


def _kernel3(b, re_ref, im_ref, f1r_ref, f1i_ref, f1s_ref, f2r_ref,
             f2i_ref, f2s_ref, c1r_ref, c1i_ref, c2r_ref, c2i_ref,
             ore_ref, oim_ref):
    from .pallas_col import mxu_precision

    dot1 = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )
    # contract i_b (dim 1 of both operands): (k_b, i_b) x (k_a, i_b)
    # -> (k_b, k_a) — natural output order with no explicit transpose
    dot2 = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )
    f1r, f1i, f1s = f1r_ref[:], f1i_ref[:], f1s_ref[:]
    f2r, f2i, f2s = f2r_ref[:], f2i_ref[:], f2s_ref[:]
    c1r, c1i = c1r_ref[:], c1i_ref[:]
    c2r, c2i = c2r_ref[:], c2i_ref[:]
    for r in range(re_ref.shape[0]):  # static unroll over the tile's rows
        xr = re_ref[r]
        xi = im_ref[r]
        # t = F(a) @ x over i_a: Karatsuba 3-dot complex matmul
        p1 = dot1(f1r, xr)
        p2 = dot1(f1i, xi)
        p3 = dot1(f1s, xr + xi)
        tr = p1 - p2
        ti = p3 - p1 - p2
        # u = t * W_n^{k_a * i_r}
        ur = tr * c1r - ti * c1i
        ui = tr * c1i + ti * c1r
        # radix-4 DFT over i_p: static lane-block slices, pure adds
        s0r, s1r, s2r, s3r = (ur[:, j * b:(j + 1) * b] for j in range(4))
        s0i, s1i, s2i, s3i = (ui[:, j * b:(j + 1) * b] for j in range(4))
        e_r, e_i = s0r + s2r, s0i + s2i  # even sum
        d_r, d_i = s0r - s2r, s0i - s2i  # even diff
        g_r, g_i = s1r + s3r, s1i + s3i  # odd sum
        h_r, h_i = s1r - s3r, s1i - s3i  # odd diff
        # y_p = sum_j s_j W_4^{j p}; -i*h = (h_i, -h_r)
        y = (
            (e_r + g_r, e_i + g_i),
            (d_r + h_i, d_i - h_r),
            (e_r - g_r, e_i - g_i),
            (d_r - h_i, d_i + h_r),
        )
        outs_r = []
        outs_i = []
        for p, (yr, yi) in enumerate(y):
            # w_p = y_p * W_{4b}^{p * i_b} (row p of the c2 table)
            wr = yr * c2r[p] - yi * c2i[p]
            wi = yr * c2i[p] + yi * c2r[p]
            # o_p = F(b) contracted over i_b -> (k_b, k_a)
            q1 = dot2(f2r, wr)
            q2 = dot2(f2i, wi)
            q3 = dot2(f2s, wr + wi)
            outs_r.append(q1 - q2)
            outs_i.append(q3 - q1 - q2)
        # flat row k_b*(4a) + p*a + k_a == k_a + a*k_p + 4a*k_b: a plain
        # lane-axis concat of the four (k_b, k_a) slabs
        ore_ref[r] = jnp.concatenate(outs_r, axis=1)
        oim_ref[r] = jnp.concatenate(outs_i, axis=1)


@functools.lru_cache(maxsize=64)
def _build3(a: int, b: int, batch: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = 4 * b
    grid = (batch // tile,)
    in_spec = pl.BlockSpec((tile, a, m), lambda i: (i, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, b, 4 * a), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    mat_spec = lambda u, v: pl.BlockSpec((u, v), lambda i: (i * 0, i * 0),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel3, b),
        grid=grid,
        in_specs=[
            in_spec,
            in_spec,
            mat_spec(a, a),
            mat_spec(a, a),
            mat_spec(a, a),
            mat_spec(b, b),
            mat_spec(b, b),
            mat_spec(b, b),
            mat_spec(a, m),
            mat_spec(a, m),
            mat_spec(4, b),
            mat_spec(4, b),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, b, 4 * a), jnp.float32),
            jax.ShapeDtypeStruct((batch, b, 4 * a), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * batch * a * m * (a + b),
            bytes_accessed=4 * batch * a * m * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(1),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def leaf_fft_pallas3(re, im, pmats, a: int, b: int):
    """DFT along the last axis of (..., n), n = a * 4 * b, as one fused
    Pallas kernel with the middle radix-4 on the VPU. ``pmats`` from
    mxu_leaf_tables3_host (on device). Returns None when the batch shape
    does not tile (caller falls back). Caller guarantees f32 + TPU."""
    batch = re.shape[:-1]
    n = a * 4 * b
    bsz = int(np.prod(batch)) if batch else 1
    if bsz % TILE_ROWS == 0:
        tile = TILE_ROWS
    elif bsz < TILE_ROWS:
        tile = bsz
    else:
        return None
    call = _build3(a, b, bsz, tile)
    ore, oim = call(re.reshape(bsz, a, 4 * b), im.reshape(bsz, a, 4 * b),
                    *pmats)
    return ore.reshape(batch + (n,)), oim.reshape(batch + (n,))


# ---------------------------------------------------------------------------
# Hybrid leaf: VPU Stockham for the n1 factor + one MXU contraction for the
# lane factor. The idea: the all-MXU kernel is compute-bound at HIGHEST
# precision with per-element cost ~ (n1 + L) matmul MACs; replacing the
# F(n1) contraction with an in-VMEM radix-16 Stockham would make the n1
# factor VPU-side and leave only the L-sized contraction on the MXU.
# MEASURED LOSER on device: the round-3 race at 2^24 f32 / n1=512 on v5e
# (scratch/r3/race_results.json) put the hybrid at 5.620 ms end-to-end vs
# 2.355 ms for the three-factor MXU leaf (leaf_kernel="mxu3") — Mosaic
# serializes the in-kernel Stockham steps where the pure-contraction
# kernels pipeline on the MXU. Kept as an opt-in variant
# (Options.leaf_kernel="hybrid") for backends where that balance flips;
# same codelet economics as the reference (codelets.rs:24-32).
# ---------------------------------------------------------------------------


def _hybrid_kernel(n1, re_ref, im_ref, f2r_ref, f2i_ref, f2s_ref,
                   cr_ref, ci_ref, ore_ref, oim_ref):
    from .pallas_col import _iota_tables, mxu_precision
    from .stockham import stockham_axis2

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )
    f2r, f2i, f2s = f2r_ref[:], f2i_ref[:], f2s_ref[:]
    cr, ci = cr_ref[:], ci_ref[:]
    tables = _iota_tables(n1)
    # column DFT over i1 for the whole tile at once (batched axis -2)
    tr, ti = stockham_axis2(re_ref[:], im_ref[:], tables, n1)
    # twiddle correction W_n^{k1*i2} in natural (k1, i2) layout
    ur = tr * cr - ti * ci
    ui = tr * ci + ti * cr
    for r in range(ur.shape[0]):  # static unroll over the tile's rows
        # contract i2 with F(L): dot(F[k2,i2], u[k1,i2]) -> (k2, k1),
        # natural order X[k1 + k2*n1] with no explicit transpose
        q1 = dot(f2r, ur[r])
        q2 = dot(f2i, ui[r])
        q3 = dot(f2s, ur[r] + ui[r])
        ore_ref[r] = q1 - q2
        oim_ref[r] = q3 - q1 - q2


@functools.lru_cache(maxsize=64)
def _build_hybrid(n1: int, batch: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (batch // tile,)
    in_spec = pl.BlockSpec((tile, n1, LANES), lambda i: (i, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, LANES, n1), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    mat_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (i * 0, i * 0),
                                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hybrid_kernel, n1),
        grid=grid,
        in_specs=[
            in_spec,
            in_spec,
            mat_spec(LANES, LANES),
            mat_spec(LANES, LANES),
            mat_spec(LANES, LANES),
            mat_spec(n1, LANES),
            mat_spec(n1, LANES),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, LANES, n1), jnp.float32),
            jax.ShapeDtypeStruct((batch, LANES, n1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * n1 * LANES * LANES,
            bytes_accessed=4 * batch * n1 * LANES * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(1),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def leaf_fft_pallas_hybrid(re, im, pmats, n1: int):
    """DFT along the last axis of (..., n), n = n1 * LANES: in-kernel
    Stockham over the n1 factor + one MXU contraction over the lanes.

    ``pmats`` = (f2r, f2i, f2s, corr_re, corr_im); correction in natural
    (k1, i2) layout. Returns None when the batch does not tile. Caller
    guarantees n1 > 1, f32 inputs, and a TPU backend."""
    batch = re.shape[:-1]
    n = n1 * LANES
    b = int(np.prod(batch)) if batch else 1
    if b % TILE_ROWS == 0:
        tile = TILE_ROWS
    elif b < TILE_ROWS:
        tile = b
    else:
        return None
    call = _build_hybrid(n1, b, tile)
    ore, oim = call(re.reshape(b, n1, LANES), im.reshape(b, n1, LANES),
                    *pmats)
    return ore.reshape(batch + (n,)), oim.reshape(batch + (n,))
