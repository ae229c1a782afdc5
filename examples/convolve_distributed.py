#!/usr/bin/env python
"""Distributed circular convolution in the permuted spectrum layout.

Demonstrates the convolution-style pipeline the distributed four-step is
designed for (SURVEY §7 step 5): forward transforms with
``permuted_output=True`` (2 all_to_alls each), a pointwise multiply in
the digit-permuted D[k1, k2] layout (pure local work — the permutation
is identical for both operands), and one inverse with
``permuted_input=True`` (2 all_to_alls) — 6 collectives end-to-end where
natural-order transforms would take 9.

Run on any machine:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/convolve_distributed.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from phastft_tpu import Direction, PlannerDit64
    from phastft_tpu.parallel import fft_distributed

    n = 1 << 14
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    h = np.zeros(n)
    h[:32] = np.hanning(32)  # short smoothing kernel

    planner = PlannerDit64(n)
    z = np.zeros(n)
    xr, xi = fft_distributed(x, z, Direction.Forward, planner,
                             permuted_output=True)
    hr, hi = fft_distributed(h, z, Direction.Forward, planner,
                             permuted_output=True)

    # pointwise multiply in the permuted layout (sharding preserved)
    yr = xr * hr - xi * hi
    yi = xr * hi + xi * hr

    out_re, _ = fft_distributed(
        np.asarray(yr), np.asarray(yi), Direction.Reverse, planner,
        permuted_input=True,
    )
    got = np.asarray(out_re)
    want = np.real(np.fft.ifft(np.fft.fft(x) * np.fft.fft(h)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    print(f"n = 2^{n.bit_length() - 1} on {len(jax.devices())} devices; "
          f"rel L2 vs numpy spectral convolution: {err:.2e}")
    assert err < 1e-12


if __name__ == "__main__":
    main()
