"""Parity tests for the fused Pallas dd (double-float) kernels.

Role of the reference's codelet-equivalence tests (codelets.rs:500-698)
for the df64 engine. NOTE on tolerances: the dd primitives rely on
error-free transforms (TwoSum / Dekker TwoProd) whose exactness holds on
the real TPU VPU (verified on hardware; rel L2 ~1e-13 at 2^24) but NOT
under the Mosaic interpreter, whose f32 op semantics may contract or
reorder — so interpret-mode runs are only checked to ~1e-6, enough to
catch structural/layout bugs while hardware runs pin the accuracy.
"""

import numpy as np
import pytest

from phastft_tpu.ops.df64 import (
    dd_leaf_correction_host,
    join_hi_lo,
    split_hi_lo,
)
from phastft_tpu.ops.pallas_dd import (
    dd_col_tables_host,
    ddcol_pallas,
    ddleaf_pallas,
)


def _run_interpret(fn, *args, **kw):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kw)


@pytest.mark.parametrize("n1,n2", [(16, 256), (32, 512)])
def test_ddcol_matches_oracle(n1, n2):
    import jax.numpy as jnp

    rng = np.random.default_rng(n1)
    x = rng.standard_normal((n1, n2))
    y = rng.standard_normal((n1, n2))
    rh, rl = split_hi_lo(x)
    ih, il = split_hi_lo(y)
    _t, t1, t2 = dd_col_tables_host(n1, n2)
    t1 = tuple(jnp.asarray(a) for a in t1)
    t2 = tuple(jnp.asarray(a) for a in t2)
    out = _run_interpret(
        ddcol_pallas, jnp.asarray(rh), jnp.asarray(rl), jnp.asarray(ih),
        jnp.asarray(il), t1, t2, n1,
    )
    assert out is not None
    got = join_hi_lo(np.asarray(out[0]), np.asarray(out[1])) + 1j * join_hi_lo(
        np.asarray(out[2]), np.asarray(out[3])
    )
    z = np.fft.fft(x + 1j * y, axis=0)
    w = np.exp(
        -2j * np.pi
        * (np.arange(n1)[:, None] * np.arange(n2)[None, :])
        / (n1 * n2)
    )
    want = z * w
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-6, err


@pytest.mark.slow
def test_ddleaf_matches_oracle():
    import jax.numpy as jnp

    n1 = 16
    n = n1 * 128
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n))
    y = rng.standard_normal((2, n))
    rh, rl = split_hi_lo(x)
    ih, il = split_hi_lo(y)
    corr = tuple(jnp.asarray(a) for a in dd_leaf_correction_host(n1, 128))
    out = _run_interpret(
        ddleaf_pallas, jnp.asarray(rh), jnp.asarray(rl), jnp.asarray(ih),
        jnp.asarray(il), corr, n1,
    )
    assert out is not None
    got = join_hi_lo(np.asarray(out[0]), np.asarray(out[1])) + 1j * join_hi_lo(
        np.asarray(out[2]), np.asarray(out[3])
    )
    want = np.fft.fft(x + 1j * y, axis=-1)
    err = np.linalg.norm(got.reshape(2, n) - want) / np.linalg.norm(want)
    assert err < 1e-6, err


def test_ddleaf_split_matches_oracle():
    """Split dd leaf (ddcol with folded leaf correction + XLA transpose +
    bare ddcol over the lanes) vs numpy, interpret mode — the round-3
    candidate replacing the XLA dd leaf."""
    import jax.numpy as jnp

    from phastft_tpu.ops.fourstep import _ddleaf_split

    n1 = 16
    n = n1 * 128
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, n))
    y = rng.standard_normal((2, n))
    rh, rl = split_hi_lo(x)
    ih, il = split_hi_lo(y)
    out = _run_interpret(
        _ddleaf_split, jnp.asarray(rh), jnp.asarray(rl), jnp.asarray(ih),
        jnp.asarray(il), n1,
    )
    assert out is not None
    got = join_hi_lo(np.asarray(out[0]), np.asarray(out[1])) + 1j * join_hi_lo(
        np.asarray(out[2]), np.asarray(out[3])
    )
    want = np.fft.fft(x + 1j * y, axis=-1)
    err = np.linalg.norm(got.reshape(2, n) - want) / np.linalg.norm(want)
    assert err < 1e-6, err


def test_dd_leaf_engine_env_dispatch(monkeypatch):
    """PHASTFT_TPU_DD_LEAF selects the dd leaf engine; the default stays
    DEFAULT_DD_LEAF and use_pallas=True keeps its legacy fused opt-in."""
    import jax
    import jax.numpy as jnp

    from phastft_tpu.ops import fourstep
    from phastft_tpu.planner import PlannerDit64

    calls = []
    monkeypatch.setattr(fourstep, "pallas_available", lambda: True)
    monkeypatch.setattr(
        fourstep, "_ddleaf_split",
        lambda *a, **k: calls.append("split") or None,
    )
    import phastft_tpu.ops.pallas_dd as pallas_dd

    monkeypatch.setattr(
        pallas_dd, "ddleaf_pallas",
        lambda *a, **k: calls.append("fused") or None,
    )
    n = 1 << 11
    planner = PlannerDit64(n)
    tables, corrs = planner.dd_state
    z = jnp.zeros((n,), jnp.float32)

    def trace(up):
        jax.make_jaxpr(
            lambda a, b, c, d: fourstep.fft_rows_dd(
                a, b, c, d, planner.plan, tables, corrs, use_pallas=up
            )
        )(z, z, z, z)

    monkeypatch.setenv("PHASTFT_TPU_DD_LEAF", "split")
    trace(None)
    assert calls == ["split"]

    calls.clear()
    monkeypatch.setenv("PHASTFT_TPU_DD_LEAF", "xla")
    trace(None)
    assert calls == []

    calls.clear()
    monkeypatch.delenv("PHASTFT_TPU_DD_LEAF")
    trace(True)  # legacy opt-in: the monolithic fused kernel
    assert calls == ["fused"]


def test_ddleaf_declines_untileable_batch():
    import jax.numpy as jnp

    n1 = 16
    n = n1 * 128
    z = jnp.zeros((5, n), jnp.float32)  # 5 rows: not tileable by 2
    corr = tuple(jnp.asarray(a) for a in dd_leaf_correction_host(n1, 128))
    assert ddleaf_pallas(z, z, z, z, corr, n1) is None
