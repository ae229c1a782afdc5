"""Error types for phastft_tpu.

The reference library panics with specific messages on contract violations
(/root/reference/src/planner.rs:66, /root/reference/src/algorithms/dit.rs:284-289,
/root/reference/src/algorithms/r2c.rs:543-553). In Python these become
exceptions; the messages mirror the reference's panic messages so downstream
code (and the reference's regression tests, src/lib.rs:254-296) translate
directly.
"""

from __future__ import annotations

__all__ = [
    "PhastftError",
    "NonPowerOfTwoError",
    "LengthMismatchError",
    "PlannerSizeMismatchError",
]


class PhastftError(ValueError):
    """Base class for all phastft_tpu contract violations."""


class NonPowerOfTwoError(PhastftError):
    """Raised when an input length is not a power of two.

    Mirrors the reference assertion "n must be a power of 2"
    (/root/reference/src/planner.rs:66).
    """


class LengthMismatchError(PhastftError):
    """Raised when paired real/imag buffers have different lengths.

    Mirrors "reals and imags must be of equal length"
    (/root/reference/src/algorithms/dit.rs:284).
    """


class PlannerSizeMismatchError(PhastftError):
    """Raised when a planner was built for a different size than the input.

    Mirrors the planner-size assertion (/root/reference/src/algorithms/dit.rs:289)
    pinned by the regression test at /root/reference/src/lib.rs:254-296.
    """


def ensure_power_of_two(n: int) -> int:
    """Validate that ``n`` is a positive power of two and return log2(n)."""
    if n <= 0 or (n & (n - 1)) != 0:
        raise NonPowerOfTwoError(f"n must be a power of 2, got {n}")
    return n.bit_length() - 1
