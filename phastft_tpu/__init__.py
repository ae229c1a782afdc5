"""phastft_tpu — a TPU-native large-FFT engine.

A brand-new JAX/XLA/Pallas implementation of the capability surface of
PhastFT (/root/reference): in-place planar radix-2 DIT C2C transforms,
reusable planners with HBM-resident twiddle tables, factorized (CO-BRAVO
style) bit reversal, compact-spectrum R2C/C2R, interleaved-complex interop,
batched/sharded execution over device meshes, and a distributed four-step
transform for sizes beyond one chip.

Primary data format is planar (separate real/imag arrays), like the
reference — on TPU this is not just a preference: complex128 does not
exist on TPU hardware at all, so planar f64 is the only way to run
double-precision FFTs there.

The f64 API requires JAX's x64 mode; importing this package enables it
(set PHASTFT_TPU_NO_X64=1 to opt out and use only the f32 API).
"""

from __future__ import annotations

import os
import warnings

if not os.environ.get("PHASTFT_TPU_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# Executables donate their input buffers so device-resident calls run
# in-place in HBM (the reference's in-place contract, README.md:221). Calls
# with host (numpy) inputs necessarily copy — silence JAX's advisory about
# that expected case.
warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable"
)

from .errors import (  # noqa: E402
    LengthMismatchError,
    NonPowerOfTwoError,
    PhastftError,
    PlannerSizeMismatchError,
)
from .options import Options  # noqa: E402
from .planner import (  # noqa: E402
    Direction,
    PlannerDit32,
    PlannerDit64,
    PlannerMode,
    PlannerR2c32,
    PlannerR2c64,
)
from .fft import (  # noqa: E402
    fft_32_dit,
    fft_32_dit_with_planner,
    fft_32_dit_with_planner_and_opts,
    fft_64_dit,
    fft_64_dit_with_planner,
    fft_64_dit_with_planner_and_opts,
)
from .real_fft import (  # noqa: E402
    c2r_fft_f32,
    c2r_fft_f32_with_planner,
    c2r_fft_f32_with_planner_and_scratch,
    c2r_fft_f64,
    c2r_fft_f64_with_planner,
    c2r_fft_f64_with_planner_and_scratch,
    r2c_fft_f32,
    r2c_fft_f32_with_planner,
    r2c_fft_f64,
    r2c_fft_f64_with_planner,
)
from . import numpy_like  # noqa: E402
from .interleaved import (  # noqa: E402
    fft_32_interleaved,
    fft_32_interleaved_with_planner,
    fft_32_interleaved_with_planner_and_opts,
    fft_64_interleaved,
    fft_64_interleaved_with_planner,
    fft_64_interleaved_with_planner_and_opts,
)

__version__ = "0.1.0"

__all__ = [
    "numpy_like",
    "Direction",
    "PlannerMode",
    "PlannerDit32",
    "PlannerDit64",
    "PlannerR2c32",
    "PlannerR2c64",
    "Options",
    "PhastftError",
    "NonPowerOfTwoError",
    "LengthMismatchError",
    "PlannerSizeMismatchError",
    "fft_32_dit",
    "fft_64_dit",
    "fft_32_dit_with_planner",
    "fft_64_dit_with_planner",
    "fft_32_dit_with_planner_and_opts",
    "fft_64_dit_with_planner_and_opts",
    "r2c_fft_f32",
    "r2c_fft_f64",
    "r2c_fft_f32_with_planner",
    "r2c_fft_f64_with_planner",
    "c2r_fft_f32",
    "c2r_fft_f64",
    "c2r_fft_f32_with_planner",
    "c2r_fft_f64_with_planner",
    "c2r_fft_f32_with_planner_and_scratch",
    "c2r_fft_f64_with_planner_and_scratch",
    "fft_32_interleaved",
    "fft_64_interleaved",
    "fft_32_interleaved_with_planner",
    "fft_64_interleaved_with_planner",
    "fft_32_interleaved_with_planner_and_opts",
    "fft_64_interleaved_with_planner_and_opts",
    "__version__",
]

# keep the module namespace to the public surface
del os, warnings
