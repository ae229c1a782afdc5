"""Tiled Pallas transpose for the four-step's final output reordering.

The last pass of the fused f32 pipeline is the (n1, n2) -> (n2, n1)
output transpose. XLA's lowering runs it at ~350 GB/s on v5e; this
kernel moves both planar components in one call with square VMEM tiles
(read row-contiguous, write row-contiguous), aiming at the copy roofline.

Measured end-to-end on v5e (f32 2^24, (256, 65536) tiles): the fused f32
pipeline runs 3.61 ms with the XLA transpose vs 4.46 ms with this kernel
— XLA's transpose is already near the shape's copy roofline and the
extra kernel boundary costs more than pairing the two components saves.
The dispatcher therefore only selects it under
PHASTFT_TPU_PALLAS_TRANSPOSE=1 (ops/fourstep._out_transpose); kept for
shapes/backends where the balance flips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from .pallas_util import vmem_limit_bytes

__all__ = ["transpose2_pallas"]

_TILE = 256


def _kernel(a_ref, b_ref, oa_ref, ob_ref):
    oa_ref[:] = a_ref[:].T
    ob_ref[:] = b_ref[:].T


@functools.lru_cache(maxsize=32)
def _build(rows: int, cols: int, ta: int, tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_spec = pl.BlockSpec((ta, tb), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tb, ta), lambda i, j: (j, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(rows // ta, cols // tb),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((cols, rows), jnp.float32),
        ) * 2,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=4 * rows * cols * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
    )


def transpose2_pallas(a, b):
    """(rows, cols) -> (cols, rows) for two f32 arrays in one kernel, or
    None when the shape does not tile (caller uses jnp.swapaxes)."""
    rows, cols = a.shape[-2], a.shape[-1]
    if a.ndim != 2 or a.dtype != jnp.float32:
        return None
    ta = min(_TILE, rows)
    tb = min(_TILE, cols)
    if rows % ta or cols % tb:
        return None
    call = _build(rows, cols, ta, tb)
    return call(a, b)
