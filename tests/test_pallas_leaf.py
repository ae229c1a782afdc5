"""Parity tests for the fused Pallas MXU leaf (ops/pallas_leaf.py).

Role of the reference's codelet-equivalence tests
(/root/reference/src/kernels/codelets.rs:500-698): the fused kernel must
match the oracle and the unfused engine exactly where they overlap. On
CPU the kernel runs in Mosaic interpret mode; the real-TPU path is
exercised by the driver's bench/entry runs.
"""

import numpy as np
import pytest

from phastft_tpu.ops.mxu import leaf_fft_mxu
from phastft_tpu.ops.pallas_leaf import TILE_ROWS, leaf_fft_pallas
from phastft_tpu.planner import PlannerDit32


def _run_interpret(fn, *args):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("n1,b", [(16, TILE_ROWS), (16, 2), (4, 8)])
def test_pallas_leaf_matches_numpy(n1, b):
    import jax.numpy as jnp

    n = n1 * 128
    planner = PlannerDit32(n)
    pmats = planner.leaf_corrs[f"mxu{n1}"][:6] + planner.leaf_corrs[f"leaf{n1}"]
    rng = np.random.default_rng(n1 + b)
    re = rng.standard_normal((b, n)).astype(np.float32)
    im = rng.standard_normal((b, n)).astype(np.float32)
    out = _run_interpret(
        leaf_fft_pallas, jnp.asarray(re), jnp.asarray(im), pmats, n1
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im, axis=-1)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-7, err


def test_pallas_leaf_matches_mxu_leaf():
    import jax.numpy as jnp

    n1 = 8
    n = n1 * 128
    planner = PlannerDit32(n)
    mats = planner.leaf_corrs[f"mxu{n1}"]
    pmats = mats[:6] + planner.leaf_corrs[f"leaf{n1}"]
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((TILE_ROWS, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((TILE_ROWS, n)), jnp.float32)
    pr, pi = _run_interpret(leaf_fft_pallas, re, im, pmats, n1)
    mr, mi = leaf_fft_mxu(re, im, mats, n1)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(mr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(mi), atol=2e-4)


def test_pallas_leaf_declines_untileable_batch():
    import jax.numpy as jnp

    n1 = 4
    n = n1 * 128
    planner = PlannerDit32(n)
    pmats = planner.leaf_corrs[f"mxu{n1}"][:6] + planner.leaf_corrs[f"leaf{n1}"]
    b = TILE_ROWS * 2 + 1  # not divisible, larger than one tile
    re = jnp.zeros((b, n), jnp.float32)
    im = jnp.zeros((b, n), jnp.float32)
    assert leaf_fft_pallas(re, im, pmats, n1) is None


@pytest.mark.parametrize("a,b3,rows", [(8, 8, TILE_ROWS), (16, 8, 2), (8, 16, 3)])
def test_pallas_leaf3_matches_numpy(a, b3, rows):
    """Three-factor kernel (middle radix-4 on the VPU) vs the numpy
    oracle: same digit-split math at any (a, b), small sizes for the
    interpreter."""
    import jax.numpy as jnp

    from phastft_tpu.ops.mxu import mxu_leaf_tables3_host
    from phastft_tpu.ops.pallas_leaf import leaf_fft_pallas3

    n = a * 4 * b3
    pmats = tuple(
        jnp.asarray(t) for t in mxu_leaf_tables3_host(a, b3, "float32")
    )
    rng = np.random.default_rng(a * 31 + b3)
    re = rng.standard_normal((rows, n)).astype(np.float32)
    im = rng.standard_normal((rows, n)).astype(np.float32)
    out = _run_interpret(
        leaf_fft_pallas3, jnp.asarray(re), jnp.asarray(im), pmats, a, b3
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im, axis=-1)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-6, err


@pytest.mark.parametrize("n1,rows", [(16, TILE_ROWS), (8, 2)])
def test_pallas_leaf_hybrid_matches_numpy(n1, rows):
    """Hybrid kernel (in-kernel VPU Stockham over n1 + one MXU
    contraction over the 128 lanes) vs the numpy oracle, using the
    planner's own F(128) matrices and natural-layout leaf correction —
    exactly the operands fft_rows hands it."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_leaf import leaf_fft_pallas_hybrid

    n = n1 * 128
    planner = PlannerDit32(n)
    hmats = (
        planner.leaf_corrs[f"mxu{n1}"][3:6]
        + planner.leaf_corrs[f"leaf{n1}"]
    )
    rng = np.random.default_rng(n1 * 7 + rows)
    re = rng.standard_normal((rows, n)).astype(np.float32)
    im = rng.standard_normal((rows, n)).astype(np.float32)
    out = _run_interpret(
        leaf_fft_pallas_hybrid, jnp.asarray(re), jnp.asarray(im), hmats, n1
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im, axis=-1)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-6, err


def test_pallas_leaf_hybrid_production_shape():
    """Hybrid kernel at the 2^24 production leaf shape (n1 = 512,
    n = 2^16) through the planner's own tables — the exact operands the
    four-step dispatches on device."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_leaf import leaf_fft_pallas_hybrid

    planner = PlannerDit32(1 << 16)
    n1 = planner.options.leaf_fft_size // 128
    n = n1 * 128
    hmats = (
        planner.leaf_corrs[f"mxu{n1}"][3:6]
        + planner.leaf_corrs[f"leaf{n1}"]
    )
    rng = np.random.default_rng(42)
    re = rng.standard_normal((TILE_ROWS, n)).astype(np.float32)
    im = rng.standard_normal((TILE_ROWS, n)).astype(np.float32)
    out = _run_interpret(
        leaf_fft_pallas_hybrid, jnp.asarray(re), jnp.asarray(im), hmats, n1
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im, axis=-1)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-6, err


def test_planner_builds_leaf3_tables():
    """The f32 planner carries mxu3_* tables for leaves >= 2^16 (both
    contractions >= 128-deep), shaped per mxu_leaf_tables3_host."""
    planner = PlannerDit32(1 << 16)
    n1 = planner.options.leaf_fft_size // 128
    key = f"mxu3_{n1}"
    assert key in planner.leaf_corrs
    t = planner.leaf_corrs[key]
    a3, b3 = t[0].shape[0], t[3].shape[0]
    assert a3 >= 128 and b3 >= 128 and a3 * 4 * b3 == n1 * 128
    assert t[6].shape == (a3, 4 * b3)  # c1 = W_n^{k_a i_r}
    assert t[8].shape == (4, b3)  # c2 = W_{4b}^{k_p i_b}


def test_pallas_leaf3_production_shape():
    """Full-size leaf3 (a = b = 128, n = 2^16) through the planner's own
    tables — validates the digit-split index math at the shape the 2^24
    transform actually uses."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_leaf import leaf_fft_pallas3

    planner = PlannerDit32(1 << 16)
    n1 = planner.options.leaf_fft_size // 128
    mats3 = planner.leaf_corrs[f"mxu3_{n1}"]
    a3, b3 = mats3[0].shape[0], mats3[3].shape[0]
    n = a3 * 4 * b3
    rng = np.random.default_rng(7)
    re = rng.standard_normal((TILE_ROWS, n)).astype(np.float32)
    im = rng.standard_normal((TILE_ROWS, n)).astype(np.float32)
    out = _run_interpret(
        leaf_fft_pallas3, jnp.asarray(re), jnp.asarray(im), mats3, a3, b3
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im, axis=-1)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-7, err
