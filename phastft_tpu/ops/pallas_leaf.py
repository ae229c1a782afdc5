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

__all__ = [
    "leaf_fft_pallas",
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
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
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
            vmem_limit_bytes=100 * 1024 * 1024,
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
# Hybrid leaf: VPU Stockham for the n1 factor + one MXU contraction for the
# lane factor. The all-MXU kernel above is compute-bound at HIGHEST
# precision with per-element cost ~ (n1 + L) matmul MACs; replacing the
# F(n1) contraction with an in-VMEM radix-16 Stockham makes the n1 factor
# nearly free (VPU flops, intermediates register/VMEM-resident) and leaves
# only the L-sized contraction on the MXU — per-element cost ~ L. Measured
# at n1 = 512 on v5e this halves the leaf kernel time. Same codelet
# economics as the reference (codelets.rs:24-32), hardware-unit aware.
# ---------------------------------------------------------------------------


def _hybrid_kernel(n1, re_ref, im_ref, f2r_ref, f2i_ref, f2s_ref,
                   cr_ref, ci_ref, ore_ref, oim_ref):
    from .pallas_col import _iota_tables
    from .stockham import stockham_axis2

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
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
            vmem_limit_bytes=100 * 1024 * 1024,
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
