#!/usr/bin/env python
"""Round-3 trimmed device race (continuation of race_f32.py, same
results file, skips cached keys). Prioritized for a short wall clock:

  1. finish the col-engine race at the default leaf (mxu2)
  2. leaf variants (mxu3, hybrid) at the winning col engine only
  3. df64 vs native f64 at 2^24 (the headline dtype)
  4. extra df64 leaf variants + smaller sizes, time permitting

One process, one measurement at a time (axon discipline).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
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
        re_np = rng.standard_normal(n).astype(np.float32)
        im_np = rng.standard_normal(n).astype(np.float32)
        o_re, o_im = run(jnp.asarray(re_np), jnp.asarray(im_np),
                         p.fast_tables, p.leaf_corrs)
        want = np.fft.fft(re_np.astype(np.float64)
                          + 1j * im_np.astype(np.float64))
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
            dd_leaf = engine.split("-", 1)[1] if "-" in engine else None
            run = build_dd_fft(n, p.options.leaf_fft_size, False, None,
                               dd_leaf)
            args = p.dd_state
            span = 6
        else:
            run = build_fast_fft(n, p.options.leaf_fft_size, False)
            args = (p.fast_tables, p.leaf_corrs)
            span = max(4, min(16, (1 << 26) // n))
        re_np = rng.standard_normal(n)
        im_np = rng.standard_normal(n)
        o_re, o_im = run(jnp.asarray(re_np), jnp.asarray(im_np), *args)[:2]
        want = np.fft.fft(re_np + 1j * im_np)
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

    # 1. finish the col race at mxu2
    measure_f32(24, "mxu2", "mxu")
    best_col = min(
        (k for k in results if k.startswith("f32:2^24:mxu2:")),
        key=lambda k: results[k]["t"],
    ).split(":")[3]
    log("winning col engine at mxu2:", best_col)
    # 2. leaf variants at the winner
    measure_f32(24, "mxu3", best_col)
    measure_f32(24, "hybrid", best_col)
    # 3. f64 headline engines
    measure_f64(24, "df64")
    measure_f64(24, "native")
    # 4. extras, time permitting
    measure_f64(24, "df64-split")
    for log_n in (20, 22):
        measure_f32(log_n, "mxu2", best_col)
    log("DONE")


if __name__ == "__main__":
    main()
