"""Tests for measured autotuning (PlannerMode.Tune, tune.py).

The reference reserves Tune without implementing it (reference
src/planner.rs:25-32,65); here it measures candidates, so the tests check
(a) a Tune planner still satisfies every numerical contract, (b) the
winner is cached in memory and on disk, (c) the disk cache round-trips.
"""

import json
import os

import numpy as np
import pytest

from phastft_tpu import Direction, PlannerDit64, PlannerMode
from phastft_tpu.fft import fft_64_dit_with_planner
from phastft_tpu.options import Options
from phastft_tpu.tune import clear_tune_cache, tune_options
from phastft_tpu.utils.testing import gen_random_signal_f64


@pytest.fixture(autouse=True)
def _fresh_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("PHASTFT_TPU_TUNE_CACHE", str(tmp_path))
    clear_tune_cache()
    yield
    clear_tune_cache()


@pytest.mark.slow
def test_tune_returns_valid_options():
    opts = tune_options(1 << 10, np.float64)
    assert isinstance(opts, Options)
    assert opts.leaf_fft_size >= 128
    assert opts.leaf_engine in ("auto", "mxu", "vpu")


def test_tune_writes_and_reuses_disk_cache(tmp_path):
    opts1 = tune_options(1 << 9, np.float32)
    files = [f for f in os.listdir(tmp_path) if f.startswith("tune-")]
    assert files, "expected an on-disk tune cache file"
    with open(tmp_path / files[0]) as f:
        table = json.load(f)
    assert "512:float32" in table
    # a fresh in-process cache must hit the disk entry (same answer, no
    # re-measurement of a poisoned entry proves the disk path is used)
    table["512:float32"]["leaf_fft_size"] = 128
    with open(tmp_path / files[0], "w") as f:
        json.dump(table, f)
    clear_tune_cache()
    opts2 = tune_options(1 << 9, np.float32)
    assert opts2.leaf_fft_size == 128
    assert opts1.leaf_engine in ("mxu", "vpu")


@pytest.mark.slow
def test_tuned_planner_roundtrip_contract():
    n = 1 << 11
    planner = PlannerDit64.with_mode(n, PlannerMode.Tune)
    re, im = gen_random_signal_f64(n)
    fre, fim = fft_64_dit_with_planner(re, im, Direction.Forward, planner)
    rre, rim = fft_64_dit_with_planner(
        np.asarray(fre), np.asarray(fim), Direction.Reverse, planner
    )
    np.testing.assert_allclose(np.asarray(rre), re, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rim), im, atol=1e-10)
    want = np.fft.fft(re + 1j * im)
    got = np.asarray(fre) + 1j * np.asarray(fim)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-12


@pytest.mark.slow
def test_tune_memoizes_in_process():
    o1 = tune_options(1 << 9, np.float64)
    o2 = tune_options(1 << 9, np.float64)
    assert o1 is o2


def test_guess_options_selects_f64_engine_by_size():
    """Measured defaults: df64-oz in its 2^20..2^24 shape window (with
    the oz plan's 2^13 leaf), df64 above it, nothing below."""
    import numpy as np

    from phastft_tpu.options import Options

    tiny = Options.guess_options(1 << 16, np.float64)
    oz = Options.guess_options(1 << 22, np.float64)
    huge = Options.guess_options(1 << 26, np.float64)
    f32 = Options.guess_options(1 << 24, np.float32)
    assert tiny.f64_engine is None
    assert oz.f64_engine == "df64-oz" and oz.leaf_fft_size == (1 << 13)
    assert huge.f64_engine == "df64"
    assert f32.f64_engine is None


def test_candidates_include_engine_knob_combos():
    """The f32 candidate grid races every leaf_kernel variant x col_engine
    on split sizes (the planner-mode bench's 'Tune >= Heuristic' claim
    needs the winners in the search space)."""
    import numpy as np

    from phastft_tpu.tune import _candidates

    cands = list(_candidates(1 << 18, np.dtype(np.float32)))
    for lk in ("mxu2", "mxu3", "hybrid"):
        assert any(c.leaf_kernel == lk for c in cands), lk
    assert any(c.leaf_kernel == "mxu3" and c.col_engine == "r4mxu"
               for c in cands)
    assert any(c.leaf_kernel == "mxu2" and c.col_engine == "mxu"
               for c in cands)
    assert any(c.leaf_kernel == "hybrid" and c.col_engine == "stockham"
               for c in cands)
    # below the leaf-variant/split threshold the grid stays lean
    small = list(_candidates(1 << 12, np.dtype(np.float32)))
    assert all(c.leaf_kernel is None and c.col_engine is None for c in small)


def test_candidates_include_oz_engine_for_eligible_f64():
    """The f64 candidate grid includes the Ozaki bf16-slice pipeline
    exactly in its shape-eligible window (2^20..2^24, leaf 2^13)."""
    import numpy as np

    from phastft_tpu.tune import _candidates

    cands = list(_candidates(1 << 22, np.dtype(np.float64)))
    assert any(
        c.f64_engine == "df64-oz" and c.leaf_fft_size == (1 << 13)
        for c in cands
    )
    small = list(_candidates(1 << 16, np.dtype(np.float64)))
    assert not any(c.f64_engine == "df64-oz" for c in small)


def test_r2c_tune_writes_wisdom_key(tmp_path, monkeypatch):
    """tune_r2c_options races the inner half-length plan and persists
    under an r2c:<n> wisdom key (the round-3 verdict's untuned knob)."""
    monkeypatch.setenv("PHASTFT_TPU_TUNE_CACHE", str(tmp_path))
    import json

    from phastft_tpu import tune

    tune.clear_tune_cache()
    opts = tune.tune_r2c_options(1 << 10, "float64")
    assert opts.leaf_fft_size >= 128
    import glob

    files = glob.glob(str(tmp_path / "*.json"))
    assert files, "no wisdom file written"
    disk = json.load(open(files[0]))
    key = [k for k in disk if k.startswith("r2c:1024:")]
    assert key, list(disk)
    tune.clear_tune_cache()
