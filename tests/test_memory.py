"""In-place (donation) evidence: compile-time buffer assignment.

The reference's headline is in-place operation with ~2x lower memory
than out-of-place libraries (/root/reference/README.md:221,248). The
TPU analog is argument donation: the executable's peak footprint must
be arguments + temps only (outputs alias the donated inputs), i.e.
~2x the planar data for a ping-pong two-kernel pipeline — NOT 3x+.

Two facts are asserted here (CPU compile; bench.py measures the same
numbers on the real device as f32_peak_x_data):

* donation is real on transforms whose output layout matches the
  input (the leaf path): the donated build saves a full data-sized
  buffer vs an undonated lowering of the same program;
* the four-step's XLA fallback path cannot alias its output through
  the final transpose (the transposed write cannot happen in place),
  which is exactly why the production f32 pipeline fuses that
  transpose into the Pallas leaf kernel's output BlockSpec
  (ops/pallas_leaft.py) — restoring the 2x footprint on device.
"""

import numpy as np
import pytest


def test_donation_saves_a_buffer_on_leaf_path():
    """Leaf-sized transform (no output transpose): the donated build's
    temp+output footprint is one data buffer smaller."""
    import jax
    import jax.numpy as jnp

    from phastft_tpu.ops.fourstep import fft_rows, plan_rows
    from phastft_tpu.planner import PlannerDit32

    n = 1 << 16
    p = PlannerDit32(n)
    plan = plan_rows(n, p.options.leaf_fft_size)

    def f(re, im, tables, corrs):
        return fft_rows(re, im, plan, tables, corrs)

    z = jnp.zeros(n, jnp.float32)
    args = (z, z, p.fast_tables, p.leaf_corrs)
    kept = jax.jit(f).lower(*args).compile().memory_analysis()
    donated = (
        jax.jit(f, donate_argnums=(0, 1))
        .lower(*args)
        .compile()
        .memory_analysis()
    )
    data = 2 * n * 4
    kept_total = (
        kept.temp_size_in_bytes
        + kept.output_size_in_bytes
        - kept.alias_size_in_bytes
    )
    don_total = (
        donated.temp_size_in_bytes
        + donated.output_size_in_bytes
        - donated.alias_size_in_bytes
    )
    assert kept_total - don_total >= 0.9 * data, (
        f"donation saved only {kept_total - don_total} bytes "
        f"(expected ~{data}): kept={kept_total} donated={don_total}"
    )


@pytest.mark.parametrize("dtype,bound", [(np.float32, 3.6),
                                         (np.float64, 3.6)])
def test_peak_memory_bounded_on_xla_path(dtype, bound):
    """Four-step (with the XLA fallback's final transpose): peak
    (args + temps + unaliased output) stays below args + 2.5x data —
    i.e. no runaway per-stage materialization. The 2x in-place figure
    requires the Pallas transposed-write pipeline and is measured on
    device by bench.py (f32_peak_x_data)."""
    import jax.numpy as jnp

    from phastft_tpu.ops.dit import build_fast_fft
    from phastft_tpu.planner import PlannerDit32, PlannerDit64

    n = 1 << 20
    dtype = np.dtype(dtype)
    cls = PlannerDit32 if dtype == np.float32 else PlannerDit64
    p = cls(n)
    run = build_fast_fft(n, p.options.leaf_fft_size, False)
    z = jnp.zeros(n, dtype.name)
    ma = (
        run.lower(z, z, p.fast_tables, p.leaf_corrs)
        .compile()
        .memory_analysis()
    )
    data = 2 * n * dtype.itemsize
    peak = (
        ma.argument_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.output_size_in_bytes
        - ma.alias_size_in_bytes
    ) / data
    assert peak < bound, (
        f"peak {peak:.2f}x data: args={ma.argument_size_in_bytes} "
        f"temp={ma.temp_size_in_bytes} out={ma.output_size_in_bytes} "
        f"alias={ma.alias_size_in_bytes}"
    )


def test_dd_engine_peak_memory_documented():
    """df64 engine footprint (round-4 verdict item 7): the dd
    representation is 4 f32 arrays = exactly 1x the planar f64 data per
    live copy, so the engine's peak is the same ping-pong multiple as
    the native path PLUS the donated f64 arguments that remain resident
    until the split consumes them. This bounds the peak and documents
    why the dd engine OOMs one power of two before native f64 on a
    fixed-HBM chip (measured 20.02 GiB needed of 15.75 at 2^28 on v5e,
    scratch/r4/bignsweep_notes.md): guess_options hands >= 2^28 back to
    the native engine (options.py)."""
    import jax.numpy as jnp

    from phastft_tpu.ops.dit import build_dd_fft
    from phastft_tpu.options import Options
    from phastft_tpu.planner import PlannerDit64

    n = 1 << 20
    p = PlannerDit64(
        n, options=Options(leaf_fft_size=1 << 13, f64_engine="df64")
    )
    run = build_dd_fft(n, 1 << 13, False)
    tables, corrs = p.dd_state
    z = jnp.zeros(n, jnp.float64)
    ma = run.lower(z, z, tables, corrs).compile().memory_analysis()
    data = 2 * n * 8
    peak = (
        ma.argument_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.output_size_in_bytes
        - ma.alias_size_in_bytes
    ) / data
    # args (1x, donated f64) + dd working set (<= 2x data in f32 pairs
    # through the pipeline, counting ping-pong) — anything past 3.6x
    # means a new uncollapsed materialization snuck in
    assert peak < 3.6, (
        f"dd peak {peak:.2f}x data: args={ma.argument_size_in_bytes} "
        f"temp={ma.temp_size_in_bytes} out={ma.output_size_in_bytes} "
        f"alias={ma.alias_size_in_bytes}"
    )
