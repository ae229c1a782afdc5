"""Shared Pallas kernel build knobs.

One switch point for the scoped-VMEM budget every fused kernel
requests. The round-4 leafT race showed the cap is a *performance*
knob, not just a safety rail: at a 120 MiB cap Mosaic stopped
pipelining the dense leaf kernel (1.50 ms), at 127 MiB it pipelines
(1.12 ms at (1024, 16384) f32 on v5e). The cap only bounds what the
compiler may schedule — it does not reserve memory — so the default
sits just under the v5e's 128 MiB physical VMEM.

PHASTFT_TPU_VMEM_LIMIT_MB overrides (racing/tuning; the kernel build
caches key on the resolved value via their callers' fresh processes).
"""

from __future__ import annotations

import os

__all__ = ["vmem_limit_bytes"]

#: Default scoped-VMEM cap (MiB) requested by every fused kernel.
DEFAULT_VMEM_MB = 127


def vmem_limit_bytes() -> int:
    v = os.environ.get("PHASTFT_TPU_VMEM_LIMIT_MB", "")
    mb = int(v) if v.isdigit() and int(v) > 0 else DEFAULT_VMEM_MB
    return mb * 1024 * 1024


#: Grid dimension semantics for the fused kernels. Round-5 device race
#: on the leafT pass at (1024, 16384) f32, v5e: "arbitrary" 1.167 ms <
#: unset 1.460 ms < "parallel" 1.563 ms — declaring the grid arbitrary
#: (sequential-revisit allowed) lets Mosaic pick the tighter pipeline
#: schedule here. PHASTFT_TPU_DIMSEM overrides: "none" (unset),
#: "parallel", "arbitrary".
DEFAULT_DIMSEM = "arbitrary"


def dim_semantics(ngrid: int):
    """dimension_semantics tuple for an ``ngrid``-dim kernel grid, per
    the measured default / PHASTFT_TPU_DIMSEM override."""
    v = os.environ.get("PHASTFT_TPU_DIMSEM", "") or DEFAULT_DIMSEM
    if v in ("parallel", "arbitrary"):
        return (v,) * ngrid
    return None
