"""Staged radix-2 decimation-in-time FFT on planar arrays — the XLA path.

TPU-native re-design of the reference's recursive DIT driver + per-stage
kernels (/root/reference/src/algorithms/dit.rs, src/kernels/dit.rs). The
reference recurses to keep blocks L1-resident and dispatches one SIMD
kernel per chunk size; under XLA the cache-blocking and lane-width concerns
disappear (the compiler tiles and fuses), so the driver becomes a flat
sequence of log2(n) vectorized butterfly stages over statically-shaped
reshapes:

    stage s:   view (..., n) as (..., n/2h, 2, h),  h = 2^s
               a = x[..., 0, :], b = x[..., 1, :]
               t = w_s * b          (complex multiply, FMA form)
               out = [a + t, a - t] restacked

which XLA compiles to one fused elementwise+concat kernel per stage. The
butterfly identity is the same FMA form the reference uses
(out0 = in0 + w*in1; out1 = 2*in0 - out0, src/kernels/dit.rs:177-183) —
expressed directly as a+t / a-t since XLA schedules FMAs itself.

The inverse uses the reference's swap trick: swap(IDFT(z)) = (1/N) DFT(swap(z))
(src/algorithms/dit.rs:291-300), so one compiled forward executable serves
both directions; only the inverse applies the 1/N scale
(src/algorithms/dit.rs:325-331, README.md:169-172).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from .bitrev import apply_bit_reversal

__all__ = [
    "butterfly_stage",
    "staged_fft",
    "build_staged_fft",
]


def butterfly_stage(re, im, wre, wim, stage: int):
    """Apply DIT butterfly stage ``stage`` (pair distance 2^stage) along the
    last axis. ``wre``/``wim`` are the stage twiddles, length 2^stage.

    Equivalent of one `fft_dit_chunk_*` kernel dispatch in the reference
    (src/algorithms/dit.rs:168-203); works for any leading batch shape.
    """
    n = re.shape[-1]
    h = 1 << stage
    batch = re.shape[:-1]
    shape3 = batch + (n // (2 * h), 2, h)
    re3 = re.reshape(shape3)
    im3 = im.reshape(shape3)
    ar, br = re3[..., 0, :], re3[..., 1, :]
    ai, bi = im3[..., 0, :], im3[..., 1, :]
    # complex t = w * b
    tr = br * wre - bi * wim
    ti = br * wim + bi * wre
    out_re = jnp.stack([ar + tr, ar - tr], axis=-2).reshape(batch + (n,))
    out_im = jnp.stack([ai + ti, ai - ti], axis=-2).reshape(batch + (n,))
    return out_re, out_im


def staged_fft(re, im, stage_twiddles: Sequence, *, tiled_bitrev: bool, scale: bool):
    """Forward DFT along the last axis: bit-reverse, then all stages.

    ``scale=True`` multiplies the output by 1/n (inverse path; the scale is
    fused by XLA into the final stage's elementwise kernel)."""
    n = re.shape[-1]
    log_n = n.bit_length() - 1
    re = apply_bit_reversal(re, n, tiled_bitrev)
    im = apply_bit_reversal(im, n, tiled_bitrev)
    for s in range(log_n):
        wre, wim = stage_twiddles[s]
        re, im = butterfly_stage(re, im, wre, wim, s)
    if scale:
        inv_n = jnp.asarray(1.0 / n, dtype=re.dtype)
        re = re * inv_n
        im = im * inv_n
    return re, im


@functools.lru_cache(maxsize=256)
def build_fast_fft(n: int, leaf_limit: int, scale: bool,
                   use_pallas=None, leaf_kernel=None, col_engine=None):
    """Compiled Stockham/four-step executable, cached per configuration.

    Takes (re, im, tables, corrs) with the planner's device tables passed
    as arguments so they are shared across executables (never baked as
    constants into the program). ``use_pallas`` / ``leaf_kernel`` /
    ``col_engine`` are the resolved Options knobs (None = auto) — part
    of the cache key, since they change the lowering."""
    from .fourstep import fft_rows, plan_rows

    plan = plan_rows(n, leaf_limit)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(re, im, tables, corrs):
        out_re, out_im = fft_rows(re, im, plan, tables, corrs,
                                  use_pallas=use_pallas,
                                  leaf_kernel=leaf_kernel,
                                  col_engine=col_engine)
        if scale:
            inv_n = jnp.asarray(1.0 / n, dtype=out_re.dtype)
            out_re = out_re * inv_n
            out_im = out_im * inv_n
        return out_re, out_im

    return run


@functools.lru_cache(maxsize=64)
def build_dd_fft(n: int, leaf_limit: int, scale: bool, use_pallas=None,
                 dd_leaf=None):
    """Compiled df64 (double-float) executable: f64 in, f64 out, all
    internal arithmetic on paired-f32 arrays (ops/df64.py; fused Pallas
    dd kernels on TPU, ops/pallas_dd.py). The hi/lo split and join are
    single fused elementwise passes at the ends; the 1/n inverse scale
    is a power of two, hence exact on both components."""
    from .fourstep import fft_rows_dd, plan_rows

    plan = plan_rows(n, leaf_limit)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(re, im, tables, corrs):
        rh = re.astype(jnp.float32)
        rl = (re - rh.astype(jnp.float64)).astype(jnp.float32)
        ih = im.astype(jnp.float32)
        il = (im - ih.astype(jnp.float64)).astype(jnp.float32)
        rh, rl, ih, il = fft_rows_dd(rh, rl, ih, il, plan, tables, corrs,
                                     use_pallas=use_pallas, dd_leaf=dd_leaf)
        out_re = rh.astype(jnp.float64) + rl.astype(jnp.float64)
        out_im = ih.astype(jnp.float64) + il.astype(jnp.float64)
        if scale:
            inv_n = jnp.asarray(1.0 / n, jnp.float64)
            out_re = out_re * inv_n
            out_im = out_im * inv_n
        return out_re, out_im

    return run


@functools.lru_cache(maxsize=256)
def build_staged_fft(n: int, tiled_bitrev: bool, scale: bool):
    """Compiled-executable factory, cached per static configuration.

    The returned callable takes (re, im, stage_twiddles) — twiddles are
    passed as arguments (not closure constants) so the planner's HBM tables
    are shared across every executable (the reference's planner-reuse
    contract, src/planner.rs:37-39). Buffers are donated: with device
    inputs the transform is in-place in HBM, matching the reference's
    in-place design (README.md:221)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(re, im, stage_twiddles):
        return staged_fft(
            re, im, stage_twiddles, tiled_bitrev=tiled_bitrev, scale=scale
        )

    return run
