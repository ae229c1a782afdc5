#!/usr/bin/env python
"""Headline benchmark: f64 C2C FFT throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric: GFLOPS (5 N log2 N / t) for a single 2^24-point f64 planar C2C
forward transform on the default device — the BASELINE.json headline
config class ("GFLOPS and GB/s per chip at 2^20-2^30 f64 C2C").

vs_baseline: speedup over numpy's pocketfft complex128 FFT on this host
(the strongest available oracle-class baseline here: XLA's own FFT cannot
run on this TPU at all — complex dtypes are unsupported — and the
reference's Rust binaries are not built in this image).

Timing uses the chain-slope method (utils/timing.py): tunnel round trips
cost ~25 ms and async dispatch lies, so per-op time is the slope between
two on-device scan chain lengths, forced by a scalar fetch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

LOG_N = 24
N = 1 << LOG_N

#: Health-probe budget. The axon tunnel can block for minutes while a
#: previously-orphaned compile drains; a probe must be patient but the
#: bench cannot wait forever.
_PROBE_TIMEOUT_S = 420
_RETRY_BACKOFF_S = 120


def numpy_baseline_seconds(x: np.ndarray) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = np.fft.fft(x)
        best = min(best, time.perf_counter() - t0)
    assert y is not None
    return best


def _backend_healthy() -> tuple[bool, str]:
    """Probe the TPU backend in a subprocess (a wedged tunnel can hang
    ``jax.devices()`` indefinitely; a child process is abandonable
    without killing this one mid-compile — its own op is trivial)."""
    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.sum(jnp.arange(8.0))))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=_PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return False, f"health probe timed out after {_PROBE_TIMEOUT_S}s"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:]
        return False, f"health probe rc={proc.returncode}: {tail}"
    return True, "ok"


def _stale_fallback(diag: str) -> None:
    """Emit a parseable headline JSON from the newest committed device
    samples, marked stale — a tunnel outage must not zero out a round's
    evidence (round-2 BENCH artifact died to exactly this)."""
    out = {
        "metric": f"fft_c2c_f64_2^{LOG_N}_single_chip",
        "value": None,
        "unit": "GFLOPS",
        "vs_baseline": None,
        "stale": True,
        "diagnostic": diag,
    }
    series = os.path.join(
        os.path.dirname(__file__), "benches", "out", "c2c_f64_forward",
        "PhastftTpu",
    )
    try:
        sizes = sorted(
            int(f[:-5]) for f in os.listdir(series) if f.endswith(".json")
        )
        n = max(s for s in sizes if s <= N)  # largest committed point
        path = os.path.join(series, f"{n}.json")
        with open(path) as f:
            sample = json.load(f)
        t = float(sample["seconds"])
        out["value"] = round(5.0 * n * (n.bit_length() - 1) / t / 1e9, 2)
        out["time_ms"] = round(t * 1e3, 3)
        out["stale_n"] = n
        out["stale_source"] = os.path.relpath(path, os.path.dirname(__file__))
        x = np.random.default_rng(0).standard_normal(n) * (1 + 0j)
        out["vs_baseline"] = round(numpy_baseline_seconds(x) / t, 3)
    except Exception as e:  # no usable committed sample
        out["stale_source_error"] = repr(e)
    try:
        series32 = os.path.join(
            os.path.dirname(__file__), "benches", "out",
            "c2c_f32_forward", "PhastftTpu",
        )
        sizes32 = sorted(
            int(f[:-5]) for f in os.listdir(series32) if f.endswith(".json")
        )
        n32 = max(s for s in sizes32 if s <= N)
        with open(os.path.join(series32, f"{n32}.json")) as f:
            s32 = json.load(f)
        t32 = float(s32["seconds"])
        out["f32_time_ms"] = round(t32 * 1e3, 3)
        out["f32_gflops"] = round(
            5.0 * n32 * (n32.bit_length() - 1) / t32 / 1e9, 2
        )
        out["f32_stale_n"] = n32
    except Exception:
        pass
    print(json.dumps(out))


def main() -> None:
    # Fail-soft evidence pipeline: probe backend health first (retry once
    # after a backoff — axon outages are often transient), and degrade to
    # a stale-marked JSON rather than a traceback if the chip is gone.
    ok, diag = _backend_healthy()
    if not ok:
        time.sleep(_RETRY_BACKOFF_S)
        ok, diag = _backend_healthy()
    if not ok:
        _stale_fallback(diag)
        return
    try:
        _run_bench()
    except Exception as e:  # backend died mid-measurement
        _stale_fallback(f"bench run failed: {e!r}")


def _run_bench() -> None:
    import jax

    # persistent compile cache: first-compile of the 2^24 pipelines costs
    # tens of seconds through the remote-AOT service; cache them so
    # repeated driver runs are warm. Best-effort (harmless if the
    # backend ignores it).
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/repo/.jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from phastft_tpu.ops.dit import build_dd_fft, build_fast_fft
    from phastft_tpu.planner import PlannerDit64
    from phastft_tpu.utils.timing import chain_time

    rng = np.random.default_rng(0)
    re = rng.standard_normal(N)
    im = rng.standard_normal(N)

    planner = PlannerDit64(N)
    # honor the planner's engine selection (guess_options picks the df64
    # double-float engine for large f64 — 1.15x native on v5e)
    f64_engine = planner.options.f64_engine or "native"
    if f64_engine.startswith("df64"):
        dd_leaf = (
            f64_engine.split("-", 1)[1] if "-" in f64_engine else None
        )
        run = build_dd_fft(
            N, planner.options.leaf_fft_size, False, None, dd_leaf
        )
        tables, corrs = planner.dd_state
    else:
        run = build_fast_fft(N, planner.options.leaf_fft_size, False)
        tables, corrs = planner.fast_tables, planner.leaf_corrs

    # correctness gate: rel L2 error vs numpy must be <= 1e-10 (north star)
    dre = jnp.asarray(re)
    dim = jnp.asarray(im)
    out_re, out_im = run(dre, dim, tables, corrs)
    want = np.fft.fft(re + 1j * im)
    got = np.asarray(out_re) + 1j * np.asarray(out_im)
    rel_err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    assert rel_err < 1e-10, f"accuracy gate failed: {rel_err}"

    dre = jnp.asarray(re)
    dim = jnp.asarray(im)
    # k_hi <= 8: longer chains around the df64 pipeline (inner chunk scan
    # + Pallas call) trigger the XLA:TPU scan-of-scan compile pathology
    t = chain_time(
        lambda r, i: run(r, i, tables, corrs), (dre, dim), k_lo=2, k_hi=8
    )
    gflops = 5.0 * N * LOG_N / t / 1e9

    t_np = numpy_baseline_seconds(re + 1j * im)

    # secondary: f32 path (MXU/Pallas leaf engine) at the same size
    from phastft_tpu.planner import PlannerDit32

    p32 = PlannerDit32(N)
    run32 = build_fast_fft(N, p32.options.leaf_fft_size, False)
    re32 = jnp.asarray(re, jnp.float32)
    im32 = jnp.asarray(im, jnp.float32)
    o32r, o32i = run32(re32, im32, p32.fast_tables, p32.leaf_corrs)
    got32 = np.asarray(o32r) + 1j * np.asarray(o32i)
    err32 = float(np.linalg.norm(got32 - want) / np.linalg.norm(want))
    assert err32 < 5e-7, f"f32 accuracy gate failed: {err32}"
    re32 = jnp.asarray(re, jnp.float32)
    im32 = jnp.asarray(im, jnp.float32)
    t32 = chain_time(
        lambda r, i: run32(r, i, p32.fast_tables, p32.leaf_corrs),
        (re32, im32), k_lo=2, k_hi=10,
    )

    # Pass-level HBM roofline accounting for the f32 path (the bandwidth-
    # bound axis; f64 is bound by emulated arithmetic, not HBM). The
    # fused two-pass pipeline (ops/pallas_leaft.py) makes 2 HBM round
    # trips — Pallas column kernel (relayout output) + transposed-write
    # leaf kernel — each reading + writing planar (re, im) f32, against
    # the v5e's ~819 GB/s HBM. If the classic pipeline is active (no
    # handshake tables), a third trip (the XLA output transpose) is
    # counted.
    HBM_GBPS = 819.0
    plan32 = p32.plan
    fused2 = (
        plan32[0] == "split"
        and plan32[2][0] == "leaf"
        and f"pcolT{plan32[1]}x{plan32[3]}" in p32.leaf_corrs
    )
    roundtrips = 2 if fused2 else 3
    f32_bytes = roundtrips * 2 * (2 * N * 4)
    f32_roofline_pct = 100.0 * f32_bytes / t32 / 1e9 / HBM_GBPS

    # R2C at the same length: the reference's headline claim is R2C ~ 2x
    # a zero-imag C2C (/root/reference/README.md:77-78). The C2C time t
    # above is the denominator (C2C time is data-independent, so random
    # imag == zeroed imag). Engine dispatch mirrors real_fft._r2c: the
    # inner half-length transform rides the planner's f64 engine
    # (df64/oz), exactly as the reference reuses its optimized C2C entry
    # for R2C (r2c.rs:555-582).
    from phastft_tpu.ops.r2c import build_r2c_fft, build_r2c_fft_dd
    from phastft_tpu.planner import PlannerR2c64

    pr = PlannerR2c64(N)
    r2c_engine = pr.dit_planner.options.f64_engine or "native"
    if r2c_engine.startswith("df64"):
        sfx = r2c_engine.split("-", 1)[1] if "-" in r2c_engine else None
        run_r2c = build_r2c_fft_dd(
            N, pr.inner_opts.leaf_fft_size,
            None, sfx if sfx in ("split", "fused", "xla") else None,
        )
        rtables, rcorrs = pr.dit_planner.dd_state
        rargs = (rtables, rcorrs, pr.twiddles_re, pr.twiddles_im)
    else:
        run_r2c = build_r2c_fft(N, pr.inner_opts.leaf_fft_size)
        rargs = (
            pr.dit_planner.fast_tables,
            pr.dit_planner.leaf_corrs,
            pr.twiddles_re,
            pr.twiddles_im,
        )
    x = jnp.asarray(re)
    sre, sim = run_r2c(x, *rargs)
    want_r = np.fft.rfft(re)
    got_r = np.asarray(sre) + 1j * np.asarray(sim)
    err_r2c = float(
        np.linalg.norm(got_r - want_r) / np.linalg.norm(want_r)
    )
    assert err_r2c < 1e-10, f"r2c accuracy gate failed: {err_r2c}"

    # Chain-slope timing: serial_time under-measures sub-dispatch-latency
    # calls through the axon tunnel (repeat dispatches of the same
    # (executable, buffers) pair return without re-executing), so chain
    # the R2C as a length-n carry — concat(spec_re[:-1], spec_im[:-1])
    # is length n and data-depends on the whole transform. The repack
    # concat adds one ~n-element pass (~0.1 ms at 2^24), biasing r2c
    # slightly SLOW — conservative for the 2x claim.
    def r2c_step(s):
        rr, ri = run_r2c(s, *rargs)
        return jnp.concatenate([rr[:-1], ri[:-1]])

    t_r2c_raw = chain_time(r2c_step, (jnp.asarray(re),), k_lo=2, k_hi=8)
    # The carrier concat is harness, not transform: measure it alone
    # and subtract (disclosed as r2c_repack_ms).
    half = N // 2

    def repack_step(s):
        return jnp.concatenate([s[: half] * 0.999, s[half:]])

    t_repack = chain_time(repack_step, (jnp.asarray(re),), k_lo=2,
                          k_hi=16)
    t_r2c = max(t_r2c_raw - t_repack, 0.5 * t_r2c_raw)

    # In-place evidence (reference headline: in-place, ~2x lower memory,
    # README.md:221,248): compile-time buffer assignment of the donated
    # f64 executable. With donation the peak transient footprint is
    # arguments + temps; the theoretical floor for an out-of-place-
    # kernel pipeline is 2x the planar data (ping-pong).
    mem = {}
    try:
        lowered = run32.lower(
            jnp.zeros(N, jnp.float32), jnp.zeros(N, jnp.float32),
            p32.fast_tables, p32.leaf_corrs,
        )
        ma = lowered.compile().memory_analysis()
        data32 = 2 * N * 4
        mem = {
            "f32_hbm_args_bytes": int(ma.argument_size_in_bytes),
            "f32_hbm_temp_bytes": int(ma.temp_size_in_bytes),
            "f32_hbm_alias_bytes": int(ma.alias_size_in_bytes),
            "f32_peak_x_data": round(
                (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                 + ma.output_size_in_bytes - ma.alias_size_in_bytes)
                / data32, 3,
            ),
        }
    except Exception:
        pass
    # f64 peak for the ACTIVE engine (round-4 verdict: the f64 memory
    # story was unquantified; the reference contract is the in-place
    # 2x-lower-memory design, README.md:221,248). data = planar f64
    # re+im. The dd engines hold 4 f32 arrays = 1x data per live copy;
    # peak_x_data captures what buffer assignment actually provisions.
    try:
        lowered64 = run.lower(
            jnp.zeros(N, jnp.float64), jnp.zeros(N, jnp.float64),
            tables, corrs,
        )
        ma64 = lowered64.compile().memory_analysis()
        data64 = 2 * N * 8
        mem["f64_peak_x_data"] = round(
            (ma64.argument_size_in_bytes + ma64.temp_size_in_bytes
             + ma64.output_size_in_bytes - ma64.alias_size_in_bytes)
            / data64, 3,
        )
        mem["f64_hbm_temp_bytes"] = int(ma64.temp_size_in_bytes)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": f"fft_c2c_f64_2^{LOG_N}_single_chip",
                "value": round(gflops, 2),
                "unit": "GFLOPS",
                "vs_baseline": round(t_np / t, 3),
                "time_ms": round(t * 1e3, 3),
                "numpy_baseline_ms": round(t_np * 1e3, 3),
                "rel_l2_error_vs_numpy": rel_err,
                "f64_engine": f64_engine,
                "effective_gbps_per_pass": round(2 * 2 * N * 8 / t / 1e9, 1),
                "f32_gflops": round(5.0 * N * LOG_N / t32 / 1e9, 2),
                "f32_time_ms": round(t32 * 1e3, 3),
                "f32_rel_l2_error": err32,
                "f32_hbm_roundtrips": roundtrips,
                "f32_achieved_gbps": round(f32_bytes / t32 / 1e9, 1),
                "f32_roofline_pct": round(f32_roofline_pct, 1),
                "r2c_f64_time_ms": round(t_r2c * 1e3, 3),
                "r2c_raw_chain_ms": round(t_r2c_raw * 1e3, 3),
                "r2c_repack_ms": round(t_repack * 1e3, 3),
                "r2c_rel_l2_error": err_r2c,
                "r2c_vs_zero_imag_c2c": round(t / t_r2c, 2),
                **mem,
            }
        )
    )


if __name__ == "__main__":
    main()
