"""Batch-sharded FFTs over a device mesh.

The embarrassingly-parallel configuration (BASELINE config #4): a batch of
independent transforms sharded over chips, twiddle tables replicated, no
cross-chip communication. This replaces the reference's rayon fork-join
over array halves (/root/reference/src/parallel.rs:6-25,
src/algorithms/dit.rs:73-77) — the TPU analog of "split the work across
cores with no sharing" is a sharded leading batch axis.

XLA's SPMD partitioner propagates the batch sharding through the whole
transform (every op is batch-pointwise), so a single jit with sharded
inputs runs each chip's slice locally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import LengthMismatchError
from ..fft import _coerce_direction, _validate
from ..ops.dit import build_fast_fft
from ..planner import Direction

__all__ = ["default_mesh", "batch_fft_sharded"]


def default_mesh(axis_name: str = "data", devices=None) -> Mesh:
    """1-D mesh over all local devices (or an explicit device list)."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def batch_fft_sharded(
    reals,
    imags,
    direction,
    planner,
    *,
    mesh: Mesh | None = None,
    axis_name: str = "data",
):
    """FFT along the last axis of (..., batch, n) arrays with the leading
    batch dimension sharded across ``mesh``.

    Twiddle tables are replicated to every chip (they are O(sqrt n) for the
    fast path); data never crosses chips. Returns device arrays with the
    same sharding as the inputs.
    """
    direction = _coerce_direction(direction)
    mesh = default_mesh(axis_name) if mesh is None else mesh
    dtype = planner.dtype

    reals = jnp.asarray(reals, dtype)
    imags = jnp.asarray(imags, dtype)
    if reals.ndim < 2:
        raise LengthMismatchError(
            "batch_fft_sharded expects at least 2 dims (batch, n); use the "
            "plain fft_* entry points for single transforms"
        )
    n, _ = _validate(reals, imags, planner, dtype)

    batch_spec = P(axis_name, *([None] * (reals.ndim - 1)))
    sharding = NamedSharding(mesh, batch_spec)
    reals = jax.device_put(reals, sharding)
    imags = jax.device_put(imags, sharding)

    scale = direction is Direction.Reverse
    # leaf size from the planner's own options so tables match the plan;
    # engine knobs forwarded so the batch path runs the same lowering as
    # the single-chip path
    run = build_fast_fft(
        n, planner.options.leaf_fft_size, scale,
        planner.options.use_pallas, planner.options.leaf_kernel,
        planner.options.col_engine,
    )
    if direction is Direction.Forward:
        return run(reals, imags, planner.fast_tables, planner.leaf_corrs)
    out_re, out_im = run(imags, reals, planner.fast_tables, planner.leaf_corrs)
    return out_im, out_re
