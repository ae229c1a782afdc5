"""Parity tests for the fused Pallas column-FFT kernel (ops/pallas_col.py).

Same role as the reference's codelet-equivalence tests
(/root/reference/src/kernels/codelets.rs:500-698): the fused kernel must
match the oracle / unfused engine where they overlap. On CPU the kernel
runs in Mosaic interpret mode; real-TPU execution is exercised by the
driver's bench/entry runs.
"""

import numpy as np
import pytest

from phastft_tpu.ops.pallas_col import col_split_tables_host, colfft_pallas


def _run_interpret(fn, *args, **kw):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kw)


def _oracle(re, im, n1, n2):
    """Column DFT over axis -2 + four-step split correction, in numpy."""
    z = np.fft.fft(re + 1j * im, axis=-2)
    k1 = np.arange(n1)[:, None]
    i2 = np.arange(n2)[None, :]
    w = np.exp(-2j * np.pi * (k1 * i2) / (n1 * n2))
    return z * w


@pytest.mark.parametrize("n1,n2,b", [(16, 256, None), (64, 256, None),
                                     (32, 512, 2)])
def test_pallas_col_matches_oracle(n1, n2, b):
    import jax.numpy as jnp

    rng = np.random.default_rng(n1 + n2)
    shape = ((b,) if b else ()) + (n1, n2)
    re = rng.standard_normal(shape).astype(np.float32)
    im = rng.standard_normal(shape).astype(np.float32)
    tabs = tuple(
        jnp.asarray(a) for a in col_split_tables_host(n1, n2, "float32")
    )
    out = _run_interpret(
        colfft_pallas, jnp.asarray(re), jnp.asarray(im), tabs, n1
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = _oracle(re, im, n1, n2)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-7, err


def test_pallas_col_declines_bad_shapes():
    import jax.numpy as jnp

    # n1 below the sublane minimum -> decline (XLA path handles it)
    re = jnp.zeros((4, 256), jnp.float32)
    tabs = tuple(
        jnp.asarray(a) for a in col_split_tables_host(4, 256, "float32")
    )
    assert colfft_pallas(re, re, tabs, 4) is None


def test_use_pallas_knob_controls_lowering(monkeypatch):
    """Options.use_pallas=False must route around the Pallas kernels; the
    default (None) may use them when available. Verified by instrumenting
    the kernel entry points (results stay engine-independent)."""
    import jax.numpy as jnp

    from phastft_tpu.ops import fourstep, pallas_col, pallas_leaf

    calls = []
    monkeypatch.setattr(
        fourstep, "pallas_available", lambda: True
    )
    monkeypatch.setattr(
        fourstep, "colfft_pallas",
        lambda *a, **k: calls.append("col") or None,
    )
    monkeypatch.setattr(
        fourstep, "leaf_fft_pallas",
        lambda *a, **k: calls.append("leaf") or None,
    )
    from phastft_tpu.ops.fourstep import fft_rows, plan_rows
    from phastft_tpu.planner import PlannerDit32

    n = 1 << 10
    planner = PlannerDit32(n)
    plan = plan_rows(n, planner.options.leaf_fft_size)
    re = jnp.zeros((n,), jnp.float32)

    fft_rows(re, re, plan, planner.fast_tables, planner.leaf_corrs,
             use_pallas=False)
    assert calls == []  # knob off: no Pallas attempt

    fft_rows(re, re, plan, planner.fast_tables, planner.leaf_corrs,
             use_pallas=True)
    assert calls  # knob on (mocked availability): Pallas attempted


def test_no_pallas_env_var_zero_means_enabled(monkeypatch):
    from phastft_tpu.ops.fourstep import _use_pallas

    monkeypatch.setenv("PHASTFT_TPU_NO_PALLAS", "1")
    assert _use_pallas(True) is False  # env kill switch wins
    monkeypatch.setenv("PHASTFT_TPU_NO_PALLAS", "0")
    import phastft_tpu.ops.fourstep as fs

    monkeypatch.setattr(fs, "pallas_available", lambda: True)
    assert fs._use_pallas(None) is True  # "0" does not disable
    assert fs._use_pallas(False) is False  # explicit opt-out


def test_pallas_col_nocorr_matches_fft(monkeypatch):
    """Bare fused column DFT (no correction) — the permuted-input
    distributed pipeline's last pass — vs numpy, interpret mode."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_col import colfft_pallas_nocorr

    n1, n2 = 32, 256
    rng = np.random.default_rng(5)
    re = rng.standard_normal((n1, n2)).astype(np.float32)
    im = rng.standard_normal((n1, n2)).astype(np.float32)
    out = _run_interpret(
        colfft_pallas_nocorr, jnp.asarray(re), jnp.asarray(im), n1
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im, axis=0)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-7, err
    # f64 declines (Mosaic has no f64)
    z = jnp.zeros((16, 256))
    assert colfft_pallas_nocorr(z, z, 16) is None


def test_pallas_transpose_matches_swapaxes():
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_transpose import transpose2_pallas

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    out = _run_interpret(transpose2_pallas, a, b)
    assert out is not None
    assert np.array_equal(np.asarray(out[0]), np.asarray(a).T)
    assert np.array_equal(np.asarray(out[1]), np.asarray(b).T)
    # non-tiling shape declines
    c = jnp.zeros((300, 256), jnp.float32)
    assert transpose2_pallas(c, c) is None


@pytest.mark.parametrize("engine", ["mxu", "r4mxu", "r8mxu", "r16mxu",
                                    "r32mxu"])
@pytest.mark.parametrize("n1,n2", [(128, 256), (256, 256)])
def test_pallas_col_engines_match_oracle(engine, n1, n2, monkeypatch):
    """The MXU column engines (dense F(n1) contraction / radix-4 DIF +
    F(n1/4)) compute the same column-DFT + split correction."""
    import jax.numpy as jnp

    monkeypatch.setenv("PHASTFT_TPU_COL_ENGINE", engine)
    rng = np.random.default_rng(n1 * 3 + n2 + len(engine))
    re = rng.standard_normal((n1, n2)).astype(np.float32)
    im = rng.standard_normal((n1, n2)).astype(np.float32)
    tabs = tuple(
        jnp.asarray(a) for a in col_split_tables_host(n1, n2, "float32")
    )
    out = _run_interpret(
        colfft_pallas, jnp.asarray(re), jnp.asarray(im), tabs, n1
    )
    assert out is not None
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = _oracle(re, im, n1, n2)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-6, (engine, err)


def test_leaf_kernel_and_col_engine_knobs_control_lowering(monkeypatch):
    """Options.leaf_kernel / Options.col_engine must reach the dispatch
    layer: each leaf_kernel value routes the big leaf through its own
    Pallas kernel, and the col_engine string is forwarded to
    colfft_pallas."""
    import jax.numpy as jnp

    from phastft_tpu.ops import fourstep

    calls = []
    monkeypatch.setattr(fourstep, "pallas_available", lambda: True)
    monkeypatch.setattr(
        fourstep, "colfft_pallas",
        lambda *a, **k: calls.append(("col", k.get("engine"))) or None,
    )
    monkeypatch.setattr(
        fourstep, "leaf_fft_pallas",
        lambda *a, **k: calls.append(("leaf2", None)) or None,
    )
    monkeypatch.setattr(
        fourstep, "leaf_fft_pallas3",
        lambda *a, **k: calls.append(("leaf3", None)) or None,
    )
    monkeypatch.setattr(
        fourstep, "leaf_fft_pallas_hybrid",
        lambda *a, **k: calls.append(("hybrid", None)) or None,
    )
    from phastft_tpu.options import Options
    from phastft_tpu.ops.fourstep import fft_rows, plan_rows
    from phastft_tpu.planner import PlannerDit32

    n = 1 << 17  # one split level + a 2^16 leaf (mxu3 tables exist);
    # leaf pinned to 2^16 — the auto heuristic now picks the fused
    # two-pass shape here, which bypasses the per-leaf kernel knobs
    planner = PlannerDit32(n, options=Options(leaf_fft_size=1 << 16))
    plan = plan_rows(n, planner.options.leaf_fft_size)
    re = jnp.zeros((n,), jnp.float32)

    fft_rows(re, re, plan, planner.fast_tables, planner.leaf_corrs,
             leaf_kernel="mxu3", col_engine="r4mxu")
    assert ("leaf3", None) in calls
    assert ("col", "r4mxu") in calls

    calls.clear()
    fft_rows(re, re, plan, planner.fast_tables, planner.leaf_corrs,
             leaf_kernel="hybrid")
    assert ("hybrid", None) in calls
    assert ("leaf3", None) not in calls

    calls.clear()
    fft_rows(re, re, plan, planner.fast_tables, planner.leaf_corrs,
             leaf_kernel="mxu2")
    assert ("leaf3", None) not in calls  # explicit two-factor kernel
    assert ("hybrid", None) not in calls
    assert ("leaf2", None) in calls


def test_dd_nested_fallback_honors_use_pallas(monkeypatch):
    """Regression (round-2 verdict): fft_rows_dd's nested XLA-path
    recursion must forward use_pallas, so Options(use_pallas=False)
    disables the dd Pallas column kernel at every split level."""
    import jax.numpy as jnp

    from phastft_tpu.ops import fourstep

    calls = []
    monkeypatch.setattr(fourstep, "pallas_available", lambda: True)

    import phastft_tpu.ops.pallas_dd as pallas_dd

    monkeypatch.setattr(
        pallas_dd, "ddcol_pallas",
        lambda *a, **k: calls.append("ddcol") or None,
    )
    import jax

    from phastft_tpu.options import Options
    from phastft_tpu.ops.fourstep import fft_rows_dd
    from phastft_tpu.planner import PlannerDit64

    n = 1 << 19  # with a 128-leaf this plan nests two split levels
    planner = PlannerDit64(n, options=Options(leaf_fft_size=128))
    plan = planner.plan
    assert plan[0] == "split" and plan[2][0] == "split", plan
    tables, corrs = planner.dd_state
    z = jnp.zeros((n,), jnp.float32)

    def trace(up):
        # abstract trace only — records which kernels dispatch tries
        jax.make_jaxpr(
            lambda a, b, c, d: fft_rows_dd(
                a, b, c, d, plan, tables, corrs, use_pallas=up
            )
        )(z, z, z, z)

    trace(False)
    assert calls == []  # knob off at every nesting level

    trace(None)
    assert calls.count("ddcol") >= 2  # auto: both levels attempt the kernel
