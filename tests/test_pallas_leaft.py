"""Parity tests for the fused two-pass pipeline (ops/pallas_leaft.py +
ops/pallas_col.colfft_pallas(out3d=True)).

Same role as the reference's codelet-equivalence tests
(/root/reference/src/kernels/codelets.rs:500-698): the HBM-minimal fused
lowering must match the oracle and the classic pipeline bit-for-intent.
On CPU the kernels run in Mosaic interpret mode; real-TPU execution is
exercised by the driver's bench/entry runs.
"""

import numpy as np
import pytest


def _run_interpret(fn, *args, **kw):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kw)


@pytest.mark.parametrize("n1,n2,b", [(128, 1024, None), (128, 2048, 2),
                                     (256, 1024, None)])
def test_fused_two_pass_matches_numpy(n1, n2, b):
    """col(out3d) -> leafT == full FFT of each length-(n1*n2) row."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_col import col_split_tables_host, colfft_pallas
    from phastft_tpu.ops.pallas_leaft import leaft_pallas, leaft_tables_host

    n = n1 * n2
    rng = np.random.default_rng(n1 + n2)
    shape = ((b,) if b else ()) + (n,)
    re = rng.standard_normal(shape).astype(np.float32)
    im = rng.standard_normal(shape).astype(np.float32)
    from phastft_tpu.ops.pallas_col import col_tile3d

    tabs = tuple(
        jnp.asarray(a)
        for a in col_split_tables_host(n1, n2, "float32",
                                       t=col_tile3d(n1, n2))
    )
    mats = tuple(
        jnp.asarray(a) for a in leaft_tables_host(n2, "float32")
    )

    def run(r, i):
        view = shape[:-1] + (n1, n2)
        c3 = colfft_pallas(
            r.reshape(view), i.reshape(view), tabs, n1, out3d=True
        )
        assert c3 is not None
        out = leaft_pallas(c3[0], c3[1], mats, n1)
        assert out is not None
        return out

    out = _run_interpret(run, jnp.asarray(re), jnp.asarray(im))
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im, axis=-1)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    # f32 FFT error grows ~sqrt(log n): 5e-7 at the 2^17..2^18 shapes,
    # proportionally looser for the 2^22-point (A = 256) case
    assert err < 5e-7 * max(1.0, (n.bit_length() - 1) / 18.0), err


def test_col_out3d_layout():
    """out3d landing spots: block j of the column pass is c[:, j*128:(j+1)*128]
    as the (j, n1, 128) slab of the 3-d layout."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_col import col_split_tables_host, colfft_pallas

    from phastft_tpu.ops.pallas_col import col_tile3d

    n1, n2 = 16, 512
    rng = np.random.default_rng(3)
    re = rng.standard_normal((n1, n2)).astype(np.float32)
    im = rng.standard_normal((n1, n2)).astype(np.float32)
    tabs = tuple(
        jnp.asarray(a)
        for a in col_split_tables_host(n1, n2, "float32",
                                       t=col_tile3d(n1, n2))
    )
    flat = _run_interpret(
        colfft_pallas, jnp.asarray(re), jnp.asarray(im),
        tuple(jnp.asarray(a)
              for a in col_split_tables_host(n1, n2, "float32")),
        n1,
    )
    c3 = _run_interpret(
        colfft_pallas, jnp.asarray(re), jnp.asarray(im), tabs, n1,
        out3d=True,
    )
    assert c3 is not None and flat is not None
    assert c3[0].shape == (n2 // 128, n1, 128)
    # not bitwise: the flat run uses a wider slab (t = 512 here), so its
    # T1/T2 twiddle factorization rounds differently
    for part in range(2):
        want = np.asarray(flat[part]).reshape(n1, n2 // 128, 128)
        got = np.asarray(c3[part])
        np.testing.assert_allclose(
            got, np.transpose(want, (1, 0, 2)), rtol=0, atol=1e-4
        )


def test_leaft_declines_bad_shapes():
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_leaft import leaft_pallas, leaft_tables_host

    mats = tuple(jnp.asarray(a) for a in leaft_tables_host(1024))
    # n1 not a multiple of the 128-row tile -> decline
    c = jnp.zeros((8, 64, 128), jnp.float32)
    assert leaft_pallas(c, c, mats, 64) is None
    # f64 -> decline (Mosaic has no f64)
    import jax

    if jax.config.read("jax_enable_x64"):
        c64 = jnp.zeros((8, 128, 128), jnp.float64)
        assert leaft_pallas(c64, c64, mats, 128) is None


def test_fft_rows_fused2_end_to_end(monkeypatch):
    """The full fft_rows dispatch takes the fused two-pass path (no
    _out_transpose) when the planner built the handshake tables —
    interpret mode standing in for the TPU backend."""
    import jax.numpy as jnp

    from phastft_tpu.ops import fourstep
    from phastft_tpu.ops.fourstep import fft_rows
    from phastft_tpu.planner import PlannerDit32

    n = 1 << 17  # plan: split(128, leaf(8), 1024)
    p = PlannerDit32(n)
    assert f"pcolT128x1024" in p.leaf_corrs and "leafT1024" in p.leaf_corrs
    monkeypatch.setattr(fourstep, "pallas_available", lambda: True)
    rng = np.random.default_rng(7)
    re = rng.standard_normal(n).astype(np.float32)
    im = rng.standard_normal(n).astype(np.float32)
    out = _run_interpret(
        fft_rows, jnp.asarray(re), jnp.asarray(im), p.plan,
        p.fast_tables, p.leaf_corrs,
    )
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = np.fft.fft(re + 1j * im)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-7, err


@pytest.mark.parametrize("engine,n1,n2", [("r4", 128, 4096),
                                          ("r16", 128, 16384)])
def test_leaft_factored_astage_matches_dense(engine, n1, n2):
    """The radix-R factored A-stage (DIT on k_A, natural-order sublane
    concat) computes the same row FFT as the dense F(A) contraction."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_leaft import leaft_pallas, leaft_tables_host

    a = n2 // 128
    rng = np.random.default_rng(a)
    cre = rng.standard_normal((a, n1, 128)).astype(np.float32)
    cim = rng.standard_normal((a, n1, 128)).astype(np.float32)
    mats = tuple(jnp.asarray(x) for x in leaft_tables_host(n2, "float32"))
    got = _run_interpret(
        leaft_pallas, jnp.asarray(cre), jnp.asarray(cim), mats, n1,
        engine=engine,
    )
    assert got is not None
    want = _run_interpret(
        leaft_pallas, jnp.asarray(cre), jnp.asarray(cim), mats, n1,
        engine="dense",
    )
    g = np.asarray(got[0]) + 1j * np.asarray(got[1])
    w = np.asarray(want[0]) + 1j * np.asarray(want[1])
    err = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert err < 5e-7, err


def test_leaft_declines_deep_rows():
    """A > 128 rows are declined by design: the minimum legal row tile
    (rt = 128, the output block's minor dim) makes a = 256 blocks
    overflow VMEM, and rt = 64 is an illegal Pallas output minor —
    both confirmed on v5e (round 5; the round-4 2^15-leaf plan never
    lowered). Deep rows nest instead (ops/fourstep.plan_rows)."""
    import jax.numpy as jnp

    from phastft_tpu.ops.pallas_leaft import leaft_pallas, leaft_tables_host

    n1, n2 = 128, 1 << 15  # a = 256
    mats = tuple(jnp.asarray(a) for a in leaft_tables_host(n2, "float32"))
    z = jnp.zeros((n2 // 128, n1, 128), jnp.float32)
    assert leaft_pallas(z, z, mats, n1) is None

