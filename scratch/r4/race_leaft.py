"""Device race: leafT A-stage engines (dense / r16 / r4) at the 2^24
fused two-pass shape — pass-alone and end-to-end times + accuracy."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
import jax.numpy as jnp

from phastft_tpu.ops.pallas_col import col_split_tables_host, col_tile3d, colfft_pallas
from phastft_tpu.ops.pallas_leaft import leaft_pallas, leaft_tables_host
from phastft_tpu.utils.timing import chain_time

OUT = "/root/repo/scratch/r4/race_leaft.json"
results = json.load(open(OUT)) if os.path.exists(OUT) else {}


def log(*a):
    print(*a, flush=True)


def save():
    json.dump(results, open(OUT, "w"), indent=1)


N1, N2 = 1024, 16384
N = N1 * N2
rng = np.random.default_rng(0)

mats = tuple(jnp.asarray(a) for a in leaft_tables_host(N2, "float32"))
ctabs = tuple(
    jnp.asarray(a)
    for a in col_split_tables_host(N1, N2, "float32", t=col_tile3d(N1, N2))
)

# ---- pass-alone: leafT on a random row-tiled handshake layout
a = N2 // 128
view = (N1 // 128, a, 128, 128)
c_re = jnp.asarray(rng.standard_normal(view), jnp.float32)
c_im = jnp.asarray(rng.standard_normal(view), jnp.float32)
for eng in ("r16", "r4", "dense"):
    key = f"leafT4:{N1}x{N2}:{eng}"
    if key in results:
        log(key, "cached", results[key])
        continue

    def run(r, i, _e=eng):
        o = leaft_pallas(r, i, mats, N1, engine=_e)
        return o[0].reshape(view), o[1].reshape(view)

    t = chain_time(jax.jit(run), (c_re, c_im), k_lo=2, k_hi=6)
    results[key] = {"ms": round(t * 1e3, 4)}
    log(key, f"{t*1e3:.3f} ms")
    save()

# ---- end-to-end fused2 (col r16mxu out3d + leafT engine)
re_np = rng.standard_normal(N)
im_np = rng.standard_normal(N)
want = np.fft.fft(re_np + 1j * im_np)
for eng in ("r16", "r4", "dense"):
    key = f"e2e:2^24:fused2v4:{eng}"
    if key in results:
        log(key, "cached", results[key])
        continue

    @jax.jit
    def run(r, i, _e=eng):
        c3 = colfft_pallas(
            r.reshape(N1, N2), i.reshape(N1, N2), ctabs, N1, out3d=True
        )
        return leaft_pallas(c3[0], c3[1], mats, N1, engine=_e)

    o = run(jnp.asarray(re_np, jnp.float32), jnp.asarray(im_np, jnp.float32))
    got = np.asarray(o[0], np.float64) + 1j * np.asarray(o[1], np.float64)
    err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    dre = jnp.asarray(rng.standard_normal(N), jnp.float32)
    dim = jnp.asarray(rng.standard_normal(N), jnp.float32)
    t = chain_time(run, (dre, dim), k_lo=2, k_hi=6)
    results[key] = {"ms": round(t * 1e3, 4), "err": err}
    log(key, f"{t*1e3:.3f} ms err {err:.3g}")
    save()

log(json.dumps(results, indent=1))
