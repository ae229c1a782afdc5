"""Execution options and size-based heuristics.

TPU-native analog of the reference ``Options`` struct
(/root/reference/src/options.rs). The reference tunes CPU concerns
(multithreaded bit reversal at log2 N >= 16, rayon chunk size 16384,
src/options.rs:30,41); on TPU the tunables are instead:

* which bit-reversal strategy to use (flat gather vs. the tiled
  transpose decomposition, the CO-BRAVO analog),
* the leaf transform size at which the four-step decomposition bottoms
  out (the analog of ``L1_BLOCK_SIZE`` = 1024 complex elements in
  /root/reference/src/algorithms/dit.rs:27 — ours is sized to VMEM, not L1),
* whether the fused Pallas kernels may be used (f32 only — Mosaic has no
  f64 support; f64 always takes the XLA path).

Like the reference, ``Options.guess_options(n)`` produces a good default
per size and users only touch this for tuning.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["Options"]

# Largest row transform executed as a single fused Stockham leaf before
# switching to the four-step (transpose) decomposition. Sized so a planar
# f64 leaf row (re+im) plus pipeline intermediates stays VMEM-class:
# 2^16 complex f64 = 1 MiB planar buffers. The reference's analogous
# constant is L1_BLOCK_SIZE = 1024 complex elements
# (src/algorithms/dit.rs:27).
DEFAULT_LEAF_SIZE = 1 << 16

# Below this size a flat index gather beats the tiled (reshape/transpose)
# bit reversal; above it the tiled form wins because every gather stays on
# a leading axis. Analog of `multithreaded_bit_reversal = log2(n) >= 16`
# (src/options.rs:41) in that it flips strategy on the same kind of
# size threshold.
TILED_BITREV_MIN_LOGN = 14


@dataclasses.dataclass(frozen=True)
class Options:
    """Per-call tuning knobs. ``None`` fields mean "auto-select by size".

    Mirrors the role of ``Options`` in /root/reference/src/options.rs:8-43:
    a small, forward-compatible struct with a `guess_options` heuristic
    constructor.
    """

    #: Use the tiled transpose-based bit-reversal (CO-BRAVO analog,
    #: see ops/bitrev.py) instead of a flat gather. None = auto.
    tiled_bit_reversal: Optional[bool] = None

    #: Transform size at which large FFTs bottom out into leaf transforms
    #: (four-step decomposition above, staged/fused kernels below).
    leaf_fft_size: int = DEFAULT_LEAF_SIZE

    #: Allow fused Pallas VMEM kernels on the f32 path (the column-pass
    #: and leaf kernels). None = auto (enabled on TPU backends); False
    #: forces the pure-XLA lowering. Honored per call: the dispatch layer
    #: keys compiled executables on the resolved value (fft.py _run ->
    #: ops/dit.build_fast_fft -> ops/fourstep._use_pallas).
    use_pallas: Optional[bool] = None

    #: Leaf execution engine: "auto" (MXU DFT-matmul for f32, VPU
    #: high-radix Stockham for f64), "mxu", or "vpu". The MXU leaf
    #: (ops/mxu.py) is ~1.7x the VPU leaf on v5e at equal-or-better
    #: accuracy; f64 has no MXU path, so "mxu" is ignored for f64.
    leaf_engine: str = "auto"

    #: Execution strategy: "auto" (Stockham/four-step fast path) or
    #: "staged" (bit-reversal + per-stage DIT butterflies, the direct
    #: analog of the reference's execution and the parity oracle).
    strategy: str = "auto"

    #: Fused Pallas leaf kernel variant for f32 leaves >= 2^16:
    #: "mxu2" (balanced two-factor Karatsuba DFT-matmuls), "mxu3"
    #: (three-factor: middle radix-4 on the VPU, half the MXU
    #: MACs/element), or "hybrid" (in-kernel VPU Stockham over the n1
    #: factor + one MXU contraction over the 128 lanes). None = auto
    #: (the PHASTFT_TPU_LEAF_KERNEL env var, else the measured default
    #: in ops/fourstep._resolve_leaf_kernel). f64: ignored.
    leaf_kernel: Optional[str] = None

    #: Fused column-kernel engine for f32 split levels: "stockham"
    #: (in-kernel VPU radix-16 steps), "mxu" (dense F(n1) contraction),
    #: or "r4mxu" (radix-4 DIF + F(n1/4) contraction). None = auto
    #: (the PHASTFT_TPU_COL_ENGINE env var, else the depth-aware
    #: measured default: "r16mxu"/"r8mxu"/"r32mxu" radix-R residue
    #: engines exist too, and colfft_pallas picks "r16mxu" for deep
    #: columns n1 >= 1024 — round-4 race, 1.13 vs 1.57 ms at
    #: (1024, 16384) — else ops/pallas_col.DEFAULT_COL_ENGINE "r4mxu"
    #: from the round-3 race: 3.224 ms vs stockham's 3.772 ms e2e at
    #: 2^24 f32 on v5e, scratch/r3/race_results.json). f64: ignored
    #: (the dd column kernel has its own lowering).
    col_engine: Optional[str] = None

    #: f64 arithmetic engine: "native" (XLA's software f64, rel L2 vs
    #: the oracle ~8e-15) or "df64" (double-float paired-f32 engine,
    #: ops/df64.py + the fused Pallas dd column kernel — measured 26.8 ms
    #: vs native's 30.9 ms at 2^24 on v5e, rel L2 ~1.3e-14, far inside
    #: the 1e-10 contract). "df64-split" / "df64-fused" additionally pin
    #: the dd LEAF lowering (two fused dd column kernels vs the
    #: monolithic VMEM kernel; bare "df64" uses the measured default,
    #: ops/fourstep.DEFAULT_DD_LEAF). "df64-oz" arms the Ozaki
    #: bf16-slice MXU pipeline (ops/pallas_ozdd.py): both dd passes as
    #: error-free slice contractions in two HBM round trips, accuracy
    #: ~1e-11 (vs ~1e-14 for the VPU dd path) — pair with
    #: leaf_fft_size = 2^13 so the plan shapes fit the oz kernels. None = defer to the planner's
    #: options; the per-call value, when set, overrides the planner's in
    #: both directions. guess_options selects "df64" for n >= 2^22 on
    #: f64. Ignored for f32 planners.
    f64_engine: Optional[str] = None

    @staticmethod
    def guess_options(n: int, dtype=None) -> "Options":
        """Return heuristic options for a transform of size ``n`` (and
        optionally element ``dtype`` — f32 and f64 prefer different
        leaves because f32 leaves run on the MXU).

        Analog of ``Options::guess_options`` (src/options.rs:38-43), with
        thresholds measured on TPU v5e (probe sweeps at 2^20-2^26).
        PlannerMode.Tune replaces these guesses with measurements.
        """
        import numpy as np

        log_n = max(n, 1).bit_length() - 1
        is_f32 = dtype is not None and np.dtype(dtype) == np.float32
        if is_f32:
            if n <= DEFAULT_LEAF_SIZE:
                # MXU leaf: one DFT-matmul leaf up to 2^16 (one HBM
                # round trip total).
                leaf = min(max(n, 256), DEFAULT_LEAF_SIZE)
            else:
                # fused two-pass split (ops/pallas_leaft.py): size the
                # leaf so the column factor n1 = n/leaf is >= 128 (the
                # transposed-write leaf's row tile) and the leaf stays
                # <= 2^14 (A <= 128: the transposed-write kernel's VMEM
                # ceiling — larger A is an illegal/overflowing block,
                # confirmed on device round 5; the round-4 2^15-leaf
                # carve-out never actually lowered). Past n1 = 2048 the
                # plan nests another split level and every level stays
                # on fused kernels (plan_rows).
                leaf = min(1 << 14, n >> 7)
        else:
            # f64 VPU path: 2^13 leaves keep the whole pipeline on-chip
            # while the transform fits (~2^21); past that, long HBM
            # streaming passes favor the big leaf. (The df64-oz window
            # below overrides to 2^13 — the oz kernels' plan shape.)
            leaf = (1 << 13) if log_n <= 21 else DEFAULT_LEAF_SIZE
            leaf = min(max(n, 256), leaf)
        # f64 engine defaults, fastest measured engine within the 1e-10
        # accuracy contract (round-4 on-device race, scratch/r4/
        # oz_device.json vs benches/out/c2c_f64_forward):
        #   2^20..2^24  df64-oz  Ozaki bf16-slice MXU pipeline — 12.8 ms
        #               vs 27.5 ms df64 at 2^24, 0.78 vs 1.21 ms at
        #               2^20; rel L2 ~2e-11. Shape window = the fused
        #               two-pass oz kernels (leaf 2^13, 128 <= n1 <=
        #               2048, A = 64).
        #   >= 2^25     df64     paired-f32 VPU engine, 1.15x native,
        #               rel L2 ~1.3e-14.
        # Callers needing ~1e-14 pass Options(f64_engine="df64");
        # bit-level native behavior: Options(f64_engine="native").
        f64_engine = None
        if not is_f32 and 20 <= log_n <= 24:
            f64_engine = "df64-oz"
            leaf = 1 << 13
        elif not is_f32 and 22 <= log_n <= 27:
            # df64's four-array dd representation OOMs HBM at 2^28
            # (measured 20.02G needed of 15.75G, scratch/r4/
            # bignsweep_notes.md); past 2^27 the native engine's two f64
            # arrays are the only single-chip fit.
            f64_engine = "df64"
        return Options(
            tiled_bit_reversal=log_n >= TILED_BITREV_MIN_LOGN,
            leaf_fft_size=leaf,
            use_pallas=None,
            strategy="auto",
            f64_engine=f64_engine,
        )
