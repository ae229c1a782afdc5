#!/usr/bin/env python
"""Round-3 device race: f32 leaf_kernel x col_engine variants + df64.

One long-lived process, one measurement at a time, progress printed
between compiles (axon discipline: never abort once a compile is
dispatched). Results land in scratch/r3/race_results.json as they come.
"""
import json
import os
import sys
import time

RESULTS = "/root/repo/scratch/r3/race_results.json"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def save(results):
    with open(RESULTS + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(RESULTS + ".tmp", RESULTS)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    log("devices:", jax.devices())

    from phastft_tpu.ops.dit import build_dd_fft, build_fast_fft
    from phastft_tpu.planner import PlannerDit32, PlannerDit64
    from phastft_tpu.utils.timing import chain_time

    results = {}
    if os.path.exists(RESULTS):
        results = json.load(open(RESULTS))

    def measure_f32(log_n, leaf_kernel, col_engine):
        key = f"f32:2^{log_n}:{leaf_kernel}:{col_engine}"
        if key in results:
            log("skip (cached)", key)
            return
        n = 1 << log_n
        p = PlannerDit32(n)
        run = build_fast_fft(n, p.options.leaf_fft_size, False,
                             None, leaf_kernel, col_engine)
        rng = np.random.default_rng(0)
        re = jnp.asarray(rng.standard_normal(n), jnp.float32)
        im = jnp.asarray(rng.standard_normal(n), jnp.float32)
        # correctness gate at first use of a variant
        o_re, o_im = run(re, im, p.fast_tables, p.leaf_corrs)
        want = np.fft.fft(np.asarray(re, np.float64)
                          + 1j * np.asarray(im, np.float64))
        got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
        log(key, "err", err)
        re = jnp.asarray(rng.standard_normal(n), jnp.float32)
        im = jnp.asarray(rng.standard_normal(n), jnp.float32)
        span = max(4, min(64, (1 << 26) // n))
        t = chain_time(lambda r, i: run(r, i, p.fast_tables, p.leaf_corrs),
                       (re, im), k_lo=2, k_hi=2 + span)
        log(key, f"{t*1e3:.3f} ms")
        results[key] = {"t": t, "err": err}
        save(results)

    def measure_f64(log_n, engine):
        key = f"f64:2^{log_n}:{engine}"
        if key in results:
            log("skip (cached)", key)
            return
        n = 1 << log_n
        p = PlannerDit64(n)
        rng = np.random.default_rng(0)
        if engine.startswith("df64"):
            # engine = "df64" (default leaf) | "df64-split" | "df64-fused"
            dd_leaf = engine.split("-", 1)[1] if "-" in engine else None
            run = build_dd_fft(n, p.options.leaf_fft_size, False, None,
                               dd_leaf)
            args = p.dd_state
            span = 6
        else:
            run = build_fast_fft(n, p.options.leaf_fft_size, False)
            args = (p.fast_tables, p.leaf_corrs)
            span = max(4, min(16, (1 << 26) // n))
        re = jnp.asarray(rng.standard_normal(n))
        im = jnp.asarray(rng.standard_normal(n))
        o_re, o_im = run(re, im, *args)
        want = np.fft.fft(np.asarray(re) + 1j * np.asarray(im))
        got = np.asarray(o_re) + 1j * np.asarray(o_im)
        err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
        log(key, "err", err)
        re = jnp.asarray(rng.standard_normal(n))
        im = jnp.asarray(rng.standard_normal(n))
        t = chain_time(lambda r, i: run(r, i, *args), (re, im),
                       k_lo=2, k_hi=2 + span)
        log(key, f"{t*1e3:.3f} ms")
        results[key] = {"t": t, "err": err}
        save(results)

    # Phase 1: the production size first (fastest path to the decision)
    for lk in ("mxu2", "mxu3", "hybrid"):
        for col in ("stockham", "r4mxu", "mxu"):
            measure_f32(24, lk, col)
    # Phase 2: df64 leaf engines vs native with the leaner dd_cmul
    for eng in ("df64", "df64-split", "df64-fused", "native"):
        measure_f64(24, eng)
    # Phase 3: other sizes for the winner grid (leaf variants only at the
    # winning col engine and vice versa, to keep compile count sane)
    best24 = min(
        (k for k in results if k.startswith("f32:2^24")),
        key=lambda k: results[k]["t"],
    )
    _, _, lk_win, col_win = best24.split(":")
    log("winner at 2^24:", lk_win, col_win)
    for log_n in (20, 22, 26):
        for lk in ("mxu2", "mxu3", "hybrid"):
            measure_f32(log_n, lk, col_win)
    for log_n in (20, 22):
        measure_f64(log_n, "df64")
        measure_f64(log_n, "native")
    log("DONE")


if __name__ == "__main__":
    main()
