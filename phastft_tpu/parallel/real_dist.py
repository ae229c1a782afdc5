"""Distributed R2C / C2R: real transforms of one giant signal sharded
across chips.

Composes the reference's half-length real-transform trick
(/root/reference/src/algorithms/r2c.rs:1-38) with the distributed
four-step C2C (parallel/fourstep_dist.py) — a capability with no
reference analog (its parallelism is single-address-space rayon only):

  forward:  local deinterleave of the contiguous shard (even/odd of a
            contiguous block stay contiguous in the global even/odd
            streams, so no communication) -> distributed half-length C2C
            -> conjugate-symmetric untangle. The untangle's mirrored
            operand z[(H-k) mod H] is a global flip + roll(1), which
            XLA's SPMD partitioner lowers to a shard-order collective
            permute plus local reversals — O(1) latency, no gather.
  inverse:  mirrored preprocess -> distributed half-length inverse
            (swap trick, 2/N scale) -> local interleave.

The compact N/2+1 layout, real DC/Nyquist bins, and scaling contract all
match the single-chip API (ops/r2c.py); outputs are sharded along the
transform axis like fft_distributed's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import (
    LengthMismatchError,
    NonPowerOfTwoError,
    ensure_power_of_two,
)
from ..ops.r2c import _pre_untangle, _untangle
from .batch import default_mesh
from .fourstep_dist import fft_distributed

__all__ = ["r2c_fft_distributed", "c2r_fft_distributed"]


def _check_r2c_size(n: int, d: int):
    ensure_power_of_two(n)
    if n < 4:
        raise NonPowerOfTwoError(
            f"R2C requires n to be a power of 2 and n >= 4, got {n}"
        )
    if n // 2 < 4 * d * d:
        raise NonPowerOfTwoError(
            f"n=2^{n.bit_length() - 1} too small to shard the half-length "
            f"transform over {d} devices"
        )


def r2c_fft_distributed(
    signal,
    planner,
    *,
    mesh: Mesh | None = None,
    axis_name: str = "x",
):
    """Distributed forward R2C: length-n real signal sharded over ``mesh``
    -> compact N/2+1 spectrum (spec_re, spec_im).

    ``planner`` is a PlannerR2c32/64 built for n. The inner half-length
    C2C runs as the sharded four-step; the deinterleave is shard-local by
    construction (contiguous shards).
    """
    mesh = default_mesh(axis_name) if mesh is None else mesh
    d = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    signal = jnp.asarray(signal, planner.dtype)
    n = int(signal.shape[-1])
    if planner.n != n:
        raise LengthMismatchError(
            f"planner is for size {planner.n} but input has size {n}"
        )
    _check_r2c_size(n, d)
    sharding = NamedSharding(mesh, P(axis_name))
    signal = jax.device_put(signal, sharding)

    # shard-local deinterleave in wide-row form (a (n/2, 2) view would
    # tile-pad 64x on TPU, ops/r2c.py); rows of 256 stay shard-local for
    # every D | n/256
    @jax.jit
    def deinterleave(x):
        rows = x.reshape(n // 256, 256)
        even = rows[:, 0::2].reshape(n // 2)
        odd = rows[:, 1::2].reshape(n // 2)
        return even, odd

    even, odd = deinterleave(signal)
    zre, zim = fft_distributed(
        even, odd, "f", planner.dit_planner, mesh=mesh, axis_name=axis_name
    )

    @jax.jit
    def untangle(zre, zim, twre, twim):
        return _untangle(zre, zim, twre, twim)

    return untangle(zre, zim, planner.twiddles_re, planner.twiddles_im)


def c2r_fft_distributed(
    spec_re,
    spec_im,
    planner,
    *,
    mesh: Mesh | None = None,
    axis_name: str = "x",
):
    """Distributed inverse C2R: compact N/2+1 spectrum -> length-n real
    signal sharded over ``mesh`` (C2R(R2C(x)) == x, 2/N folded scale)."""
    mesh = default_mesh(axis_name) if mesh is None else mesh
    d = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    spec_re = jnp.asarray(spec_re, planner.dtype)
    spec_im = jnp.asarray(spec_im, planner.dtype)
    if spec_re.shape != spec_im.shape:
        raise LengthMismatchError(
            f"spec_re and spec_im must be of equal length, got "
            f"{spec_re.shape} and {spec_im.shape}"
        )
    n = planner.n
    if int(spec_re.shape[-1]) != n // 2 + 1:
        raise LengthMismatchError(
            f"spec must have length N/2 + 1 = {n // 2 + 1}, got "
            f"{int(spec_re.shape[-1])}"
        )
    _check_r2c_size(n, d)

    @jax.jit
    def pre(sr, si, twre, twim):
        return _pre_untangle(sr, si, twre, twim)

    z_re, z_im = pre(
        spec_re, spec_im, planner.c2r_twiddles_re, planner.c2r_twiddles_im
    )
    # inverse half-length FFT (fft_distributed owns the swap trick and
    # applies 1/(N/2) — the single-chip C2R's 2/N folded scale)
    out_re, out_im = fft_distributed(
        z_re, z_im, "r", planner.dit_planner, mesh=mesh, axis_name=axis_name
    )

    @jax.jit
    def interleave(re_h, im_h):
        re_rows = re_h.reshape(n // 256, 128)
        im_rows = im_h.reshape(n // 256, 128)
        zero = jnp.asarray(0, re_h.dtype)
        pe = jax.lax.pad(re_rows, zero, ((0, 0, 0), (0, 1, 1)))
        po = jax.lax.pad(im_rows, zero, ((0, 0, 0), (1, 0, 1)))
        return (pe + po).reshape(n)

    return interleave(out_re, out_im)
