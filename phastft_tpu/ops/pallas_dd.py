"""Fused Pallas kernels for the double-float (df64) engine.

Mosaic has no f64 — but the dd representation is pairs of f32s, so the
df64 engine (ops/df64.py) is the one f64-class path that CAN run as
fused Pallas kernels. Round-2 profiling showed the XLA df64 lowering is
~7x above its VPU arithmetic bound (32 ms at 2^24 vs ~4.5 ms of dd ops):
like the f32 path before ops/pallas_col.py, it pays one HBM round trip
per radix step plus layout copies. These kernels run all column radix
steps and the dd split correction VMEM-resident in ONE round trip, and
the whole dd leaf (column steps + correction + transpose + lane-factor
steps) in another.

Twiddles: dd accuracy (~2^-48) rules out in-kernel f32 trig, and Mosaic
cannot reshape a (q,) table vector to the (q, 1, 1) broadcast shape, so
dd step twiddles are passed pre-broadcast as (R-1, q, 1, lanes) operands
— a leading-axis index yields the (q, 1, lanes) broadcast operand with
no shape cast. The per-slab T1 correction column is selected from a
VMEM-resident (n1, n2/T) table by a lane mask (iota == program id) and
a lane-axis sum — pure VPU, no dynamic slicing (Mosaic rejects both
(n1, 1) block specs and dynamic lane slices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .df64 import (
    dd_cmul,
    dd_split_correction_host,
    split_hi_lo,
    stockham_axis2_dd,
)
from .stockham import LANES, radix_schedule
from .pallas_util import dim_semantics, vmem_limit_bytes

__all__ = [
    "ddcol_pallas",
    "ddcol_pallas_nocorr",
    "ddleaf_pallas",
    "dd_col_tables_host",
    "dd_step_tables_host",
    "DD_COL_TILE",
]

#: Lane-slab width of the dd column kernel. dd blocks are 4 f32 arrays;
#: (n1 * T) <= 2^16 keeps one in-block at <= 256 KiB per component.
DD_COL_TILE = 256

#: Rows per dd leaf program (4 components x (tile, n1, 128) blocks).
DD_LEAF_TILE = 2


@functools.lru_cache(maxsize=32)
def dd_step_tables_host(m: int, lanes: int):
    """Pre-broadcast dd Stockham step twiddles for a size-m column DFT:
    list over steps (q > 1 only) of ((cur, R), 4 arrays (R-1, q, 1, lanes))
    in (re_hi, re_lo, im_hi, im_lo) order. Exact f64 angles, Dekker split
    (the dd accuracy contract of ops/df64.py)."""
    out = []
    cur = m
    for radix in radix_schedule(m):
        q = cur // radix
        if q > 1:
            p = np.arange(q, dtype=np.float64)
            comps = [[], [], [], []]
            for j in range(1, radix):
                ang = -2.0 * np.pi * j * p / cur
                c = np.cos(ang)
                s = np.sin(ang)
                for arr, comp in zip(
                    split_hi_lo(c) + split_hi_lo(s), comps
                ):
                    comp.append(
                        np.broadcast_to(
                            arr.reshape(q, 1, 1), (q, 1, lanes)
                        ).astype(np.float32)
                    )
            out.append(
                ((cur, radix), tuple(np.stack(c) for c in comps))
            )
        cur //= radix
    return out


@functools.lru_cache(maxsize=32)
def dd_col_tables_host(n1: int, n2: int):
    """dd split-correction tables factored on the kernel slab width T:
    W_n^(k1*(j*T+c)) = T1[k1, j] * T2[k1, c]. Returns (T, T1 4-tuple
    (n1, n2/T), T2 4-tuple (n1, T))."""
    n = n1 * n2
    t = min(DD_COL_TILE, n2)
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    j = np.arange(n2 // t, dtype=np.float64)[None, :]
    c = np.arange(t, dtype=np.float64)[None, :]
    ang1 = (-2.0 * np.pi / n) * (k1 * (j * t))
    ang2 = (-2.0 * np.pi / n) * (k1 * c)
    t1 = split_hi_lo(np.cos(ang1)) + split_hi_lo(np.sin(ang1))
    t2 = split_hi_lo(np.cos(ang2)) + split_hi_lo(np.sin(ang2))
    return (
        t,
        tuple(a.astype(np.float32) for a in t1),
        tuple(a.astype(np.float32) for a in t2),
    )


def _tables_from_refs(steps, tab_refs):
    """Rebuild the stockham_axis2_dd tables dict from packed operands."""
    tables = {}
    for s, (key, _q) in enumerate(steps):
        comps = [tab_refs[4 * s + i][:] for i in range(4)]
        nj = comps[0].shape[0]
        tables[key] = tuple(
            tuple(comp[j] for comp in comps) for j in range(nj)
        )
    return tables


def _ddcol_kernel(steps, n1, re_h, re_l, im_h, im_l, *rest):
    from jax.experimental import pallas as pl

    ntab = 4 * len(steps)
    tab_refs = rest[:ntab]
    (t1rh, t1rl, t1ih, t1il, t2rh, t2rl, t2ih, t2il,
     orh, orl, oih, oil) = rest[ntab:]
    tables = _tables_from_refs(steps, tab_refs)
    rh, rl, ih, il = stockham_axis2_dd(
        re_h[0], re_l[0], im_h[0], im_l[0], tables, n1
    )
    # T1 column select by lane mask (no dynamic lane indexing in Mosaic)
    j = pl.program_id(1)
    csel = jax.lax.broadcasted_iota(jnp.int32, t1rh.shape, 1) == j
    zero = jnp.float32(0.0)

    def col(ref):
        return jnp.sum(
            jnp.where(csel, ref[:], zero), axis=1, keepdims=True
        )

    rh, rl, ih, il = dd_cmul(
        rh, rl, ih, il, col(t1rh), col(t1rl), col(t1ih), col(t1il)
    )
    rh, rl, ih, il = dd_cmul(
        rh, rl, ih, il, t2rh[:], t2rl[:], t2ih[:], t2il[:]
    )
    orh[0], orl[0], oih[0], oil[0] = rh, rl, ih, il


@functools.lru_cache(maxsize=32)
def _build_ddcol(n1: int, n2: int, batch: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, _t1, _t2 = dd_col_tables_host(n1, n2)
    steps_tabs = dd_step_tables_host(n1, t)
    steps = tuple((key, tabs[0].shape[1]) for key, tabs in steps_tabs)
    grid = (batch, n2 // t)
    data_spec = pl.BlockSpec(
        (1, n1, t), lambda b, j: (b, b * 0, j), memory_space=pltpu.VMEM
    )
    tab_specs = []
    for _key, tabs in steps_tabs:
        spec = pl.BlockSpec(
            tabs[0].shape,
            lambda b, j: (b * 0, b * 0, b * 0, b * 0),
            memory_space=pltpu.VMEM,
        )
        tab_specs += [spec] * 4
    t1_spec = pl.BlockSpec(
        (n1, n2 // t), lambda b, j: (b * 0, b * 0), memory_space=pltpu.VMEM
    )
    t2_spec = pl.BlockSpec(
        (n1, t), lambda b, j: (b * 0, b * 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_ddcol_kernel, steps, n1)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[data_spec] * 4 + tab_specs + [t1_spec] * 4
        + [t2_spec] * 4,
        out_specs=(data_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch, n1, n2), jnp.float32)
            for _ in range(4)
        ),
        cost_estimate=pl.CostEstimate(
            flops=400 * batch * n1 * n2 * len(radix_schedule(n1)),
            bytes_accessed=8 * batch * n1 * n2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(2),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )
    # cached as HOST arrays: jnp.asarray here would capture trace-local
    # constants in the lru_cache and leak tracers across jit traces
    tab_arrays = []
    for _key, tabs in steps_tabs:
        tab_arrays += list(tabs)
    return call, tuple(tab_arrays)


def ddcol_pallas(rh, rl, ih, il, t1, t2, n1: int):
    """dd column DFT of size n1 over axis -2 of (..., n1, n2) dd-planar
    arrays, fused with the dd split correction. ``t1``/``t2`` are the
    device 4-tuples from ``dd_col_tables_host``. Returns None when the
    shape does not fit (caller falls back to the XLA dd path)."""
    n2 = rh.shape[-1]
    batch = rh.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    t = min(DD_COL_TILE, n2)
    if n1 < 8 or n1 > 1024 or n2 % t != 0 or n2 // t > 1024:
        return None
    if t1[0].shape != (n1, n2 // t) or t2[0].shape != (n1, t):
        return None
    call, tab_arrays = _build_ddcol(n1, n2, b)
    shape = (b, n1, n2)
    outs = call(
        rh.reshape(shape), rl.reshape(shape), ih.reshape(shape),
        il.reshape(shape), *tab_arrays, *t1, *t2
    )
    full = batch + (n1, n2)
    return tuple(o.reshape(full) for o in outs)


def _ddcol_nocorr_kernel(steps, n1, re_h, re_l, im_h, im_l, *rest):
    ntab = 4 * len(steps)
    tab_refs = rest[:ntab]
    orh, orl, oih, oil = rest[ntab:]
    tables = _tables_from_refs(steps, tab_refs)
    rh, rl, ih, il = stockham_axis2_dd(
        re_h[0], re_l[0], im_h[0], im_l[0], tables, n1
    )
    orh[0], orl[0], oih[0], oil[0] = rh, rl, ih, il


@functools.lru_cache(maxsize=32)
def _build_ddcol_nocorr(n1: int, n2: int, batch: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = min(DD_COL_TILE, n2)
    steps_tabs = dd_step_tables_host(n1, t)
    steps = tuple((key, tabs[0].shape[1]) for key, tabs in steps_tabs)
    grid = (batch, n2 // t)
    data_spec = pl.BlockSpec(
        (1, n1, t), lambda b, j: (b, b * 0, j), memory_space=pltpu.VMEM
    )
    tab_specs = []
    for _key, tabs in steps_tabs:
        spec = pl.BlockSpec(
            tabs[0].shape,
            lambda b, j: (b * 0, b * 0, b * 0, b * 0),
            memory_space=pltpu.VMEM,
        )
        tab_specs += [spec] * 4
    kernel = functools.partial(_ddcol_nocorr_kernel, steps, n1)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[data_spec] * 4 + tab_specs,
        out_specs=(data_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch, n1, n2), jnp.float32)
            for _ in range(4)
        ),
        cost_estimate=pl.CostEstimate(
            flops=400 * batch * n1 * n2 * len(radix_schedule(n1)),
            bytes_accessed=8 * batch * n1 * n2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(2),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )
    tab_arrays = []
    for _key, tabs in steps_tabs:
        tab_arrays += list(tabs)
    return call, tuple(tab_arrays)


def ddcol_pallas_nocorr(rh, rl, ih, il, n1: int):
    """Bare dd column DFT of size n1 over axis -2 of (..., n1, n2)
    dd-planar arrays (all radix steps VMEM-resident, no correction) —
    the lane-factor pass of the split dd leaf. Returns None when the
    shape does not fit."""
    n2 = rh.shape[-1]
    batch = rh.shape[:-2]
    b = int(np.prod(batch)) if batch else 1
    t = min(DD_COL_TILE, n2)
    if n1 < 8 or n1 > 1024 or n2 % t != 0 or n2 // t > 1024:
        return None
    call, tab_arrays = _build_ddcol_nocorr(n1, n2, b)
    shape = (b, n1, n2)
    outs = call(
        rh.reshape(shape), rl.reshape(shape), ih.reshape(shape),
        il.reshape(shape), *tab_arrays
    )
    full = batch + (n1, n2)
    return tuple(o.reshape(full) for o in outs)


# ---------------------------------------------------------------- dd leaf
def _ddleaf_kernel(steps1, steps2, n1, re_h, re_l, im_h, im_l, *rest):
    n1tab = 4 * len(steps1)
    n2tab = 4 * len(steps2)
    tabs1 = _tables_from_refs(steps1, rest[:n1tab])
    tabs2 = _tables_from_refs(steps2, rest[n1tab:n1tab + n2tab])
    (crh, crl, cih, cil, orh, orl, oih, oil) = rest[n1tab + n2tab:]
    for r in range(re_h.shape[0]):  # static unroll over tile rows
        rh, rl, ih, il = stockham_axis2_dd(
            re_h[r], re_l[r], im_h[r], im_l[r], tabs1, n1
        )
        rh, rl, ih, il = dd_cmul(
            rh, rl, ih, il, crh[:], crl[:], cih[:], cil[:]
        )
        rh, rl, ih, il = (a.T for a in (rh, rl, ih, il))
        rh, rl, ih, il = stockham_axis2_dd(rh, rl, ih, il, tabs2, LANES)
        orh[r], orl[r], oih[r], oil[r] = rh, rl, ih, il


@functools.lru_cache(maxsize=32)
def _build_ddleaf(n1: int, batch: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps1_tabs = dd_step_tables_host(n1, LANES)
    steps2_tabs = dd_step_tables_host(LANES, n1)
    steps1 = tuple((k, t[0].shape[1]) for k, t in steps1_tabs)
    steps2 = tuple((k, t[0].shape[1]) for k, t in steps2_tabs)
    grid = (batch // tile,)
    in_spec = pl.BlockSpec(
        (tile, n1, LANES), lambda i: (i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (tile, LANES, n1), lambda i: (i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    tab_specs = []
    for _k, tabs in (*steps1_tabs, *steps2_tabs):
        spec = pl.BlockSpec(
            tabs[0].shape, lambda i: (i * 0,) * 4, memory_space=pltpu.VMEM
        )
        tab_specs += [spec] * 4
    corr_spec = pl.BlockSpec(
        (n1, LANES), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_ddleaf_kernel, steps1, steps2, n1)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 4 + tab_specs + [corr_spec] * 4,
        out_specs=(out_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch, LANES, n1), jnp.float32)
            for _ in range(4)
        ),
        cost_estimate=pl.CostEstimate(
            flops=400 * batch * n1 * LANES
            * (len(radix_schedule(n1)) + len(radix_schedule(LANES))),
            bytes_accessed=8 * batch * n1 * LANES * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics(1),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )
    # host arrays on purpose — see _build_ddcol
    tab_arrays = []
    for _k, tabs in (*steps1_tabs, *steps2_tabs):
        tab_arrays += list(tabs)
    return call, tuple(tab_arrays)


def ddleaf_pallas(rh, rl, ih, il, corr, n1: int):
    """dd leaf DFT along the last axis of (..., n), n = n1 * LANES, fully
    VMEM-resident (column steps + dd correction + transpose + lane
    steps). ``corr`` is the device 4-tuple from dd_leaf_correction_host.
    Returns None when the batch does not tile."""
    batch = rh.shape[:-1]
    n = n1 * LANES
    b = int(np.prod(batch)) if batch else 1
    if n1 < 8 or n1 > 1024:
        return None
    if b % DD_LEAF_TILE == 0:
        tile = DD_LEAF_TILE
    elif b < DD_LEAF_TILE:
        tile = b
    else:
        return None
    call, tab_arrays = _build_ddleaf(n1, b, tile)
    shape = (b, n1, LANES)
    outs = call(
        rh.reshape(shape), rl.reshape(shape), ih.reshape(shape),
        il.reshape(shape), *tab_arrays, *corr
    )
    full = batch + (n,)
    return tuple(o.reshape(full) for o in outs)
