"""Test configuration.

Tests run on CPU with 8 virtual devices so the full suite — including the
multi-chip sharding paths — runs anywhere, fast (the driver validates the
real-TPU path separately via __graft_entry__ and bench.py). Set
PHASTFT_TPU_TEST_BACKEND=tpu to run the suite against a real TPU instead.
"""

import os

if os.environ.get("PHASTFT_TPU_TEST_BACKEND", "cpu") == "cpu":
    # Force CPU even when the ambient env points at a TPU backend. A
    # sitecustomize may already have imported jax (so env vars are too
    # late) — use the config API, which works until a backend initializes.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_backend_optimization_level" not in flags:
        # XLA:CPU's LLVM backend contracts mul+add across the TwoSum /
        # TwoProd boundaries of the df64 engine inside fused regions
        # (jit-vs-eager diffs up to ~1e-8 rel at some plan shapes, and
        # ~1e-7 with fast-math). Opt level 0 restores bit-exact FP
        # semantics — and compiles FASTER (65 s vs 95 s for the two
        # heaviest files; the CPU suite is compile-dominated). TPU (the
        # production backend) is unaffected: measured dd rel L2 is
        # ~1.3e-14 there (BENCH series).
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags
    import jax

    jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("PHASTFT_TPU_TUNE_CACHE", "0")  # keep tests hermetic

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def n_devices():
    return len(jax.devices())


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "multidevice: needs >= 8 local (virtual) devices"
    )
