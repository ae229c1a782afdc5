"""Device-time measurement that survives async dispatch tunnels.

Equivalent in role to the reference's criterion configuration
(/root/reference/benches/common/mod.rs): a single methodology every
benchmark shares. On tunneled TPU backends a blocking round trip costs
tens of milliseconds and `block_until_ready` may return before device
work completes, so wall-clock-per-call lies. The chain-slope method
instead times K-iteration on-device `lax.scan` chains at two K values
and divides the delta:

    t_op = (T(k_hi) - T(k_lo)) / (k_hi - k_lo)

which cancels dispatch, transfer, and tunnel overhead exactly, and a
host-side scalar fetch of a reduction over the final carry forces real
completion of the whole chain.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "chain_time",
    "chain_time_samples",
    "measure_fft_time",
    "serial_time",
]


def _timed_scalar(fn, args, reps: int) -> float:
    """Min wall time of fn(*args) forced via scalar fetch."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out)  # d2h of one scalar: forces the full dependency chain
        best = min(best, time.perf_counter() - t0)
    return best


def _chain_executables(step: Callable, k_lo: int, k_hi: int):
    def make(k):
        @jax.jit
        def run(*carry):
            def body(c, _):
                out = step(*c)
                if not isinstance(out, tuple):
                    out = (out,) + tuple(c[1:])
                return out, None

            out, _ = jax.lax.scan(body, carry, None, length=k)
            return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out))

        return run

    return make(k_lo), make(k_hi), make


def chain_time(
    step: Callable,
    args: tuple,
    *,
    k_lo: int = 2,
    k_hi: int = 12,
    reps: int = 3,
) -> float:
    """Seconds per application of ``step`` on-device.

    ``step`` maps a pytree carry to a same-structure carry; ``args`` is the
    initial carry tuple. Two jitted executables run the step k_lo and k_hi
    times inside lax.scan; the slope isolates pure device time.
    """
    f_lo, f_hi, make = _chain_executables(step, k_lo, k_hi)
    float(f_lo(*args))  # warm up compile
    # A non-positive slope means the k_hi - k_lo delta drowned in tunnel
    # jitter (~1 ms); retry with the span doubled rather than returning
    # the 1e-9 clamp as if it were a measurement.
    for attempt in range(3):
        float(f_hi(*args))  # warm up compile
        t_lo = _timed_scalar(f_lo, args, reps)
        t_hi = _timed_scalar(f_hi, args, reps)
        slope = (t_hi - t_lo) / (k_hi - k_lo)
        if slope > 1e-9 or k_hi >= 8192:
            break
        k_hi = min(2 + (k_hi - 2) * 4, 8192)
        f_hi = make(k_hi)
    return max(slope, 1e-9)


def chain_time_samples(
    step: Callable,
    args: tuple,
    *,
    k_lo: int = 2,
    k_hi: int = 12,
    reps: int = 2,
    samples: int = 3,
) -> list[float]:
    """``samples`` independent chain-slope estimates of ``step``.

    The per-sample method is chain_time's; returning every estimate gives
    the sample tree the dispersion criterion records with its 20-sample
    policy (/root/reference/benches/common/mod.rs:50) — so plots can show
    IQR whiskers and a noisy tunnel point is distinguishable from a real
    regression. Compiles are shared across samples."""
    f_lo, f_hi, make = _chain_executables(step, k_lo, k_hi)
    float(f_lo(*args))
    float(f_hi(*args))
    out: list[float] = []
    for s in range(max(1, samples)):
        t_lo = _timed_scalar(f_lo, args, reps)
        t_hi = _timed_scalar(f_hi, args, reps)
        slope = (t_hi - t_lo) / (k_hi - k_lo)
        if slope <= 1e-9 and k_hi < 8192 and not out:
            # span too short for the jitter floor: escalate once, restart
            k_hi = min(2 + (k_hi - 2) * 4, 8192)
            f_hi = make(k_hi)
            float(f_hi(*args))
            continue
        out.append(max(slope, 1e-9))
    return out or [1e-9]


def measure_fft_time(fft_step, re, im, **kw) -> float:
    """Seconds per FFT for a planar step (re, im) -> (re, im)."""
    return chain_time(lambda r, i: fft_step(r, i), (re, im), **kw)


def serial_time(fn, args: tuple = (), *, iters: int = 10,
                reps: int = 2) -> float:
    """Seconds per call of ``fn(*args)`` by dispatching batches of
    independent calls and differencing two batch sizes.

    Fallback for ops whose output shape differs from the input (so they
    cannot chain as a scan carry) or whose scan-wrapped form triggers the
    XLA:TPU concat->scan compile pathology (docs/ARCHITECTURE.md): TPU
    executes queued calls serially, so wall time over k dispatched calls
    is linear in k, and T(2k) - T(k) cancels dispatch/tunnel overhead
    like the chain-slope method does.
    """
    out = fn(*args)
    jax.block_until_ready(out)  # warm-up / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs[-1])
        t1 = time.perf_counter()
        outs = [fn(*args) for _ in range(2 * iters)]
        jax.block_until_ready(outs[-1])
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / iters)
    return max(best, 1e-9)
