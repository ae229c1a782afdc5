"""Transposed-write Pallas leaf FFT: the four-step's row pass with the
final output transpose fused into the kernel's output BlockSpec.

This removes the last bare HBM pass of the f32 four-step pipeline. The
classic pipeline is column-kernel -> leaf-kernel -> XLA transpose: three
HBM round trips over the working set, one of which (the transpose) moves
data without computing anything — the round-3 profile put 2^24 f32 at
36% of the HBM roofline for exactly this reason. The algorithmic minimum
is two round trips (every element must be read+written once per
butterfly *pass*, and two passes cover n <= 2^25). This kernel is the
second pass of that minimal pipeline.

The trick is the layout handshake with the column kernel
(ops/pallas_col.colfft_pallas with out3d=True):

    col pass   reads  x  viewed (n1, n2), writes  c  as (A, n1, M)
               where i2 = i_A*M + i_M, M = 128, A = n2/M — i.e. each
               column program's (n1, 128)-lane slab lands as one
               contiguous (1, n1, 128) block: a pure BlockSpec change,
               no in-kernel shuffles.
    this pass  reads  c  in (A, RT, M) row-tiles (RT = 128 rows of the
               n1 axis), runs the whole length-n2 leaf FFT on them, and
               writes (M, A, RT) tiles of the *final* flat output
               out[k1 + n1*k2] viewed as (k_M, k_A, k1) — the four-step
               transpose becomes the output index map.

    (A row-tiled (n1/RT, A, RT, M) handshake variant — fully contiguous
    leaf reads, per-tile column writes — was raced on device in round 4
    and LOST: 1.57 ms vs 1.12 ms for this layout at (1024, 16384); the
    per-iA 64 KiB runs of this layout already feed the DMA well and the
    extra (RT, 128) stores in the column kernel cost more than the
    contiguity buys. scratch/r4/race_leaft.json.)

Per tile the math is the standard two-factor leaf (ops/mxu.py), arranged
so every contraction's operand layout is already what dot_general wants —
the row-tile axis rides along as extra lanes and NO in-kernel transpose,
relayout, or per-row unrolled loop is needed:

    t[kA, r*M + iM] = sum_iA F_A[kA, iA] * c[iA, r, iM]     (lhs-contract)
    u = t * W_n2^{kA * iM}                                   (broadcast)
    v[kM, kA*RT + r] = sum_iM F_M[kM, iM] * u[kA*RT+r, iM]   (NT-contract)
    out tile = v viewed (M, A?, ...)  -- wait, see _kernel: v is
               (k_M, k_A*RT) which reshapes (free) to (k_M, k_A, RT),
               exactly the output block.

The reference's counterpart is the fused-codelet economics of
/root/reference/src/kernels/codelets.rs:24-32 (retire more of the
transform per residency) applied to the *last* pass, plus the in-place
contract (README.md:221): output writes land directly in the final
order. f32 only (Mosaic has no f64); the caller guarantees a TPU
backend or interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from .pallas_util import dim_semantics, vmem_limit_bytes

__all__ = [
    "leaft_tables_host",
    "leaft_pallas",
    "ROW_TILE",
]

#: Rows of the n1 (outer) axis per grid program. The output block's minor
#: dim is the n1 axis, so the tile must be a multiple of the 128-lane
#: tiling; 128 keeps the in/out blocks at 8 MiB each for n2 = 2^14.
ROW_TILE = 128


def _row_tile(a: int = 128) -> int:
    """Resolved row tile: the PHASTFT_TPU_LEAFT_RT env var (a race
    knob — bigger tiles amortize the per-program table reloads), else
    ROW_TILE. The output block's MINOR dim is the row tile, so Pallas
    requires rt >= 128 (a 64-tile lowering error was confirmed on v5e,
    round 5 — which also means a > 128 leaves cannot shrink their
    blocks this way; leaft_pallas declines them instead and the planner
    nests the split so A stays <= 128)."""
    import os

    v = os.environ.get("PHASTFT_TPU_LEAFT_RT", "")
    if v.isdigit() and int(v) in (128, 256, 512):
        return int(v)
    return ROW_TILE

#: Second leaf factor (the lane axis of the column kernel's 3-d output).
M_LANES = 128


#: Measured default for the leafT A-stage engine (PHASTFT_TPU_LEAFT
#: overrides): "dense" contracts the full F(A); "r16"/"r4" factor the
#: A-axis DFT as radix-R DIT — F(A/R) contractions per residue + an
#: in-register DFT-R across residues, natural-order output — cutting
#: the stage's MXU MACs by R at a VPU combine cost. Round-4 on-device
#: race at (1024, 16384) f32, v5e (scratch/r4/race_leaft.json):
#: dense 1.12 ms < r4 1.33 < r16 1.41 pass-alone, and end-to-end
#: dense 2.26 < r16 2.44 < r4 2.73 — the pass is NOT MXU-MAC-bound
#: (the earlier 1.50 ms figure was a 120 MiB vmem-limit artifact;
#: at 127 MiB the dense kernel pipelines properly), so the factored
#: variants' extra VPU combine only costs.
DEFAULT_LEAFT_ENGINE = "dense"


def _resolve_leaft_engine(flag=None) -> str:
    import os

    v = flag or os.environ.get("PHASTFT_TPU_LEAFT", "")
    if v in ("dense", "r16", "r4"):
        return v
    return DEFAULT_LEAFT_ENGINE


@functools.lru_cache(maxsize=64)
def leaft_r_tables_host(n2: int, radix: int, dtype_name: str = "float32"):
    """Host tables for the radix-R factored A-stage: G = F(A/R) with its
    Karatsuba sum, plus the DIT phase W_A^{k_j * c} as an (A/R, R)
    table (static lane slice per residue c in-kernel). Exact f64
    angles, one cast."""
    from .mxu import dft_matrix_host

    a = n2 // M_LANES
    m = a // radix
    gr, gi = dft_matrix_host(m, dtype_name)
    dtype = np.dtype(dtype_name)
    kj = np.arange(m, dtype=np.int64)[:, None]
    c = np.arange(radix, dtype=np.int64)[None, :]
    ang = -2.0 * np.pi * ((kj * c) % a).astype(np.float64) / a
    return (
        gr, gi, gr + gi,
        np.cos(ang).astype(dtype), np.sin(ang).astype(dtype),
    )


@functools.lru_cache(maxsize=64)
def leaft_tables_host(n2: int, dtype_name: str = "float32"):
    """Host tables for the transposed-write leaf of length n2 = A * 128:
    (f1r, f1i, f1s [A x A], f2r, f2i, f2s [128 x 128], cr, ci [A x 128])
    with Karatsuba sums precomputed and the inner twiddle correction
    W_n2^{k_A * i_M} in natural (k_A, i_M) layout. Exact f64 angles,
    single rounding (src/planner.rs:148-159 contract)."""
    from .mxu import dft_matrix_host
    from .stockham import leaf_correction_host

    a = n2 // M_LANES
    f1r, f1i = dft_matrix_host(a, dtype_name)
    f2r, f2i = dft_matrix_host(M_LANES, dtype_name)
    cr, ci = leaf_correction_host(a, M_LANES, dtype_name)
    return f1r, f1i, f1r + f1i, f2r, f2i, f2r + f2i, cr, ci


def _dot1(a_, b_):
    from .pallas_col import mxu_precision

    # lhs-side contraction of the leading axis — no transposes
    return jax.lax.dot_general(
        a_, b_,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )


def _dot2(a_, b_):
    from .pallas_col import mxu_precision

    # NT contraction of both minor axes — the MXU-native layout; the
    # output (k_M, k_A*RT) IS the transposed block the four-step wants
    return jax.lax.dot_general(
        a_, b_,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )


def _astage_dense(a, f1r_ref, f1i_ref, f1s_ref, xr, xi):
    """t = F(A) @ x as one dense Karatsuba contraction."""
    f1r, f1i, f1s = f1r_ref[:], f1i_ref[:], f1s_ref[:]
    p1 = _dot1(f1r, xr)
    p2 = _dot1(f1i, xi)
    p3 = _dot1(f1s, xr + xi)
    return p1 - p2, p3 - p1 - p2


def _astage_radix(a, radix, gr_ref, gi_ref, gs_ref, pr_ref, pi_ref,
                  xr, xi):
    """t = F(A) @ x factored radix-R DIT on the output index
    k_A = q*(A/R) + k_j: per residue c of i_A = R*d + c, T_c =
    F(A/R) @ x[c::R] (an R-times-shallower contraction), the DIT
    phase W_A^{k_j*c}, and an in-register DFT-R across residues;
    sublane concatenation is already natural k_A order (q-major) —
    the same natural-order identity as ops/pallas_col._kernel_r16."""
    from .stockham import _dft_regs

    m1 = a // radix
    gr, gi, gs = gr_ref[:], gi_ref[:], gs_ref[:]
    pr, pi = pr_ref[:], pi_ref[:]
    lanes = xr.shape[-1]
    x3r = xr.reshape(m1, radix, lanes)
    x3i = xi.reshape(m1, radix, lanes)
    u = []
    for c in range(radix):
        xrc = x3r[:, c, :]
        xic = x3i[:, c, :]
        p1 = _dot1(gr, xrc)
        p2 = _dot1(gi, xic)
        p3 = _dot1(gs, xrc + xic)
        tr = p1 - p2
        ti = p3 - p1 - p2
        prc = pr[:, c:c + 1]
        pic = pi[:, c:c + 1]
        u.append((tr * prc - ti * pic, tr * pic + ti * prc))
    ys = _dft_regs(u)
    return (
        jnp.concatenate([y[0] for y in ys], axis=0),
        jnp.concatenate([y[1] for y in ys], axis=0),
    )


def _kernel(a, rt, radix, *refs):
    if radix:
        (gr_ref, gi_ref, gs_ref, pr_ref, pi_ref, f2r_ref, f2i_ref,
         f2s_ref, cr_ref, ci_ref, re_ref, im_ref, ore_ref,
         oim_ref) = refs
    else:
        (f1r_ref, f1i_ref, f1s_ref, f2r_ref, f2i_ref, f2s_ref, cr_ref,
         ci_ref, re_ref, im_ref, ore_ref, oim_ref) = refs
    m = M_LANES
    xr = re_ref[0].reshape(a, rt * m)
    xi = im_ref[0].reshape(a, rt * m)
    if radix:
        tr, ti = _astage_radix(a, radix, gr_ref, gi_ref, gs_ref,
                               pr_ref, pi_ref, xr, xi)
    else:
        tr, ti = _astage_dense(a, f1r_ref, f1i_ref, f1s_ref, xr, xi)
    tr = tr.reshape(a, rt, m)
    ti = ti.reshape(a, rt, m)
    # u = t * W_n2^{k_A * i_M}: (A, 1, M) broadcast over the row tile
    cr = cr_ref[:].reshape(a, 1, m)
    ci = ci_ref[:].reshape(a, 1, m)
    ur = (tr * cr - ti * ci).reshape(a * rt, m)
    ui = (tr * ci + ti * cr).reshape(a * rt, m)
    f2r, f2i, f2s = f2r_ref[:], f2i_ref[:], f2s_ref[:]
    q1 = _dot2(f2r, ur)
    q2 = _dot2(f2i, ui)
    q3 = _dot2(f2s, ur + ui)
    vr = q1 - q2
    vi = q3 - q1 - q2
    # out[k1 + n1*(k_A + A*k_M)] viewed (k_M, k_A, k1-tile): a free
    # minor-dim split of (k_M, k_A*RT)
    ore_ref[0] = vr.reshape(m, a, rt)
    oim_ref[0] = vi.reshape(m, a, rt)


@functools.lru_cache(maxsize=64)
def _build(a: int, n1: int, batch: int, rt: int, radix: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = M_LANES
    grid = (batch, n1 // rt)
    # zeros derived from the i32 program ids (see ops/pallas_leaf.py:
    # literal zeros become i64 under x64 mode and Mosaic rejects the
    # mixed-type index-map signature)
    in_spec = pl.BlockSpec(
        (1, a, rt, m), lambda b, p: (b, b * 0, p, b * 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, m, a, rt), lambda b, p: (b, b * 0, b * 0, p),
        memory_space=pltpu.VMEM,
    )
    mat_spec = lambda u, v: pl.BlockSpec(
        (u, v), lambda b, p: (b * 0, b * 0), memory_space=pltpu.VMEM
    )
    if radix:
        m1 = a // radix
        a_specs = [mat_spec(m1, m1)] * 3 + [mat_spec(m1, radix)] * 2
        a_flops = 6 * batch * n1 * a * m * (a // radix) \
            + 40 * batch * n1 * a * m
    else:
        a_specs = [mat_spec(a, a)] * 3
        a_flops = 6 * batch * n1 * a * m * a
    return pl.pallas_call(
        functools.partial(_kernel, a, rt, radix),
        grid=grid,
        in_specs=[
            *a_specs,
            mat_spec(m, m),
            mat_spec(m, m),
            mat_spec(m, m),
            mat_spec(a, m),
            mat_spec(a, m),
            in_spec,
            in_spec,
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, m, a, n1), jnp.float32),
            jax.ShapeDtypeStruct((batch, m, a, n1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=a_flops + 6 * batch * n1 * a * m * m,
            bytes_accessed=4 * batch * n1 * a * m * 4,
            transcendentals=0,
        ),
        # At a = 128 (n2 = 2^14) the in/out double-buffered blocks plus
        # Karatsuba temporaries peak at ~106 MiB of scoped VMEM (the r4
        # A-stage's residue temporaries reach 124.2 MiB) — inside the
        # v5e's 128 MiB physical VMEM but over the default limit.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(2),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def leaft_pallas(cre, cim, mats, n1: int, engine=None):
    """Row FFTs of length n2 = A * 128 over the column kernel's 3-d
    output layout, with the four-step output transpose fused into the
    output BlockSpec.

    ``cre``/``cim``: (..., A, n1, M) f32 — element [i_A, k1, i_M] is the
    corrected column-pass value of row k1 at i2 = i_A*M + i_M.
    ``mats``: device tables from ``leaft_tables_host``.
    ``engine``: A-stage variant ("dense" | "r16" | "r4"; None = env/
    measured default — the factored tables are small trace-time
    constants, so only the dense F(A) lives in planner state).

    Returns (..., n) planar arrays in final natural order
    (X[k1 + n1*k2] flat), or None when the shape does not tile (caller
    falls back to the classic pipeline)."""
    a, m = cre.shape[-3], cre.shape[-1]
    if cre.shape[-2] != n1 or m != M_LANES:
        return None
    if a > 128:
        # (1, a, rt, m) blocks with the minimum legal rt = 128 would be
        # 16 MiB per array at a = 256; in+out double-buffered overflows
        # the 128 MiB VMEM (and rt < 128 is an illegal output minor dim
        # — confirmed lowering error on v5e, round 5). Deep rows belong
        # to a nested split plan (ops/fourstep.plan_rows), where every
        # level keeps A <= 128.
        return None
    rt = _row_tile(a)
    if n1 % rt != 0 or n1 < rt:
        rt = ROW_TILE
    if n1 % rt != 0 or n1 < rt:
        return None
    if cre.dtype != jnp.float32:
        return None
    engine = _resolve_leaft_engine(engine)
    radix = {"r16": 16, "r4": 4}.get(engine, 0)
    if radix and (a % radix != 0 or a // radix < 8):
        radix = 0
    batch = cre.shape[:-3]
    b = int(np.prod(batch)) if batch else 1
    if radix:
        n2 = a * m
        extra = tuple(
            jnp.asarray(t) for t in leaft_r_tables_host(n2, radix)
        )
        ops = extra + mats[3:]
    else:
        ops = mats
    call = _build(a, n1, b, rt, radix)
    ore, oim = call(
        *ops, cre.reshape(b, a, n1, m), cim.reshape(b, a, n1, m)
    )
    n = n1 * a * m
    return ore.reshape(batch + (n,)), oim.reshape(batch + (n,))
