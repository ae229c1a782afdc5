"""Comm/compute-overlap hardening for the chunked distributed pipeline.

Round-4 verdict item 8: the claimed >=80% weak-scaling lever is that the
chunked four-step keeps chunk pipelines independent, so the scheduler can
run chunk i+1's column compute between chunk i's all_to_alls. This is a
dependency property of the compiled HLO: the number of all_to_alls on the
critical path must equal the PHASE count (3 natural-order / 2 permuted),
independent of the chunk count — a change that serializes the chunks
(chunk i+1 consuming chunk i's collective output) makes it grow linearly
with chunks and fails these tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phastft_tpu.parallel import default_mesh
from phastft_tpu.parallel.fourstep_dist import _build_distributed, _factor
from phastft_tpu.planner import PlannerDit64
from phastft_tpu.utils.hlo import all_to_all_chain_depth

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _depth(n, d, chunks_env, monkeypatch, permuted_output=False):
    monkeypatch.setenv("PHASTFT_TPU_DIST_CHUNKS", str(chunks_env))
    planner = PlannerDit64(n)
    mesh = default_mesh("x", devices=jax.devices()[:d])
    # fresh build per chunk count: the env var is read at trace time and
    # the builder cache key does not include it
    _build_distributed.cache_clear()
    run, _ = _build_distributed(
        n, d, "x", planner.options.leaf_fft_size, False, permuted_output,
        tuple(mesh.devices.flat),
    )
    z = jnp.zeros(n, jnp.float64)
    hlo = run.lower(
        z, z, planner.fast_tables, planner.leaf_corrs
    ).compile().as_text()
    return all_to_all_chain_depth(hlo)


@needs8
def test_chunked_pipeline_keeps_collectives_off_critical_path(monkeypatch):
    n, d = 1 << 16, 8
    base = _depth(n, d, 1, monkeypatch)
    chunked = _depth(n, d, 4, monkeypatch)
    # natural order = 3 collective phases; chunking must NOT deepen the
    # chain (a serialized pipeline would show ~chunks+2 = 6)
    assert base == 3, base
    assert chunked == base, (chunked, base)


@needs8
def test_chunked_permuted_pipeline_depth(monkeypatch):
    n, d = 1 << 16, 8
    chunked = _depth(n, d, 4, monkeypatch, permuted_output=True)
    assert chunked == 2, chunked


@needs8
def test_dd_distributed_chain_depth():
    """The dd (fast-f64) distributed pipeline keeps the same 3-phase
    collective critical path as the native one — 4 f32 arrays ride the
    same structure."""
    from phastft_tpu.parallel.fourstep_dist import (
        _build_distributed_dd,
        _dd_dist_state,
        _factor_dd,
    )

    n, d = 1 << 16, 8
    planner = PlannerDit64(n)
    mesh = default_mesh("x", devices=jax.devices()[:d])
    n1, n2 = _factor_dd(n, d)
    _plan, ddt, ddc, t1, t2 = _dd_dist_state(
        n1, n2, planner.options.leaf_fft_size, "df64"
    )
    run, _m = _build_distributed_dd(
        n, d, "x", planner.options.leaf_fft_size, False, False,
        tuple(mesh.devices.flat), "df64",
    )
    z = jnp.zeros(n, jnp.float64)
    hlo = run.lower(z, z, ddt, ddc, t1, t2).compile().as_text()
    assert all_to_all_chain_depth(hlo) == 3
