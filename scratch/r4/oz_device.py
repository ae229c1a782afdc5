"""Device test: oz dd fused2 pipeline at 2^20 and 2^24 — accuracy + time."""
import json, os, sys
import sys as _s
_s.setrecursionlimit(100000)
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
import jax.numpy as jnp
from phastft_tpu.utils.timing import chain_time
from phastft_tpu.ops.pallas_ozdd import (
    ozcol_tables_host, ozleaft_tables_host, ozcol_pallas, ozleaft_pallas)
from phastft_tpu.ops.df64 import split_hi_lo

OUT = "/root/repo/scratch/r4/oz_device.json"
results = json.load(open(OUT)) if os.path.exists(OUT) else {}
def log(*a): print(*a, flush=True)
def save(): json.dump(results, open(OUT, "w"), indent=1)

rng = np.random.default_rng(0)
for logn, n1 in [(20, 128), (22, 512), (24, 2048)]:
    key = f"oz:2^{logn}:{n1}"
    if key in results:
        log(key, "cached", results[key]); continue
    n = 1 << logn
    n2 = n // n1
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    arrs = [jnp.asarray(a).reshape(n1, n2)
            for pair in (split_hi_lo(x.real), split_hi_lo(x.imag))
            for a in pair]
    ctabs = tuple(jnp.asarray(a) for a in ozcol_tables_host(n1, n2))
    ltabs = tuple(jnp.asarray(a) for a in ozleaft_tables_host(n2))

    @jax.jit
    def run(rh, rl, ih, il):
        c = ozcol_pallas(rh, rl, ih, il, ctabs, n1)
        assert c is not None, "ozcol declined"
        out = ozleaft_pallas(*c, ltabs, n1)
        assert out is not None, "ozleaft declined"
        return tuple(o.reshape(n1, n2) for o in out)  # carry-friendly

    o = run(*arrs)
    got = (np.asarray(o[0], np.float64).ravel()
           + np.asarray(o[1], np.float64).ravel()) \
        + 1j * (np.asarray(o[2], np.float64).ravel()
                + np.asarray(o[3], np.float64).ravel())
    want = np.fft.fft(x)
    err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    log(key, "err", err)
    arrs2 = [jnp.asarray(rng.standard_normal((n1, n2)), jnp.float32)
             for _ in range(4)]
    t = chain_time(run, tuple(arrs2), k_lo=2, k_hi=6)
    results[key] = {"ms": round(t * 1e3, 4), "err": err}
    log(key, f"{t*1e3:.3f} ms")
    save()
log(json.dumps(results, indent=1))
