"""Device race (ADVICE r3 medium): classic-path leaf kernels mxu3 vs
mxu2 at 2^16..2^23 and one batched shape — DEFAULT_LEAF_KERNEL=mxu3 was
flipped from a single 2^24 point."""
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

from phastft_tpu.ops.dit import build_fast_fft
from phastft_tpu.planner import PlannerDit32
from phastft_tpu.utils.timing import chain_time

OUT = "/root/repo/scratch/r4/race_leafk.json"
results = json.load(open(OUT)) if os.path.exists(OUT) else {}


def log(*a):
    print(*a, flush=True)


def save():
    json.dump(results, open(OUT, "w"), indent=1)


rng = np.random.default_rng(0)
cases = [(1 << ln, None) for ln in (16, 18, 20, 22, 23)]
cases.append((1 << 18, 16))  # batched
for n, b in cases:
    # classic path: force the pre-fused2 leaf shape (2^16 leaves)
    from phastft_tpu.options import Options

    opts = Options(leaf_fft_size=min(n, 1 << 16))
    p = PlannerDit32(n, options=opts)
    shape = ((b,) if b else ()) + (n,)
    re_np = rng.standard_normal(shape)
    im_np = rng.standard_normal(shape)
    want = np.fft.fft(re_np + 1j * im_np, axis=-1)
    for variant in ("mxu3", "mxu2"):
        key = f"f32:{'b%dx' % b if b else ''}2^{n.bit_length()-1}:{variant}"
        if key in results:
            log(key, "cached", results[key])
            continue
        run = build_fast_fft(n, p.options.leaf_fft_size, False,
                             leaf_kernel=variant)
        o = run(jnp.asarray(re_np, jnp.float32),
                jnp.asarray(im_np, jnp.float32),
                p.fast_tables, p.leaf_corrs)
        got = np.asarray(o[0], np.float64) + 1j * np.asarray(o[1], np.float64)
        err = float(np.linalg.norm(got - want) / np.linalg.norm(want))
        re = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        im = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        t = chain_time(
            lambda r, i: run(r, i, p.fast_tables, p.leaf_corrs)[:2],
            (re, im), k_lo=2, k_hi=8,
        )
        results[key] = {"ms": round(t * 1e3, 4), "err": err}
        log(key, f"{t*1e3:.3f} ms err {err:.3g}")
        save()

log(json.dumps(results, indent=1))
