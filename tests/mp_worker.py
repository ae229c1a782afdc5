"""Multi-process mesh worker for test_multiprocess.py.

Each process owns 2 virtual CPU devices; `jax.distributed.initialize`
joins them into one 4-device global mesh and the distributed four-step
runs with Gloo cross-process collectives — the closest exercisable
analog of the multi-host TPU path (SURVEY §7 step 5) in a single-machine
environment. Invoked as:

    python mp_worker.py <coordinator addr> <process id> <num processes>
"""

import sys

import numpy as np

import jax

# the baked sitecustomize registers the axon TPU backend regardless of the
# JAX_PLATFORMS env var; the config API still wins before first backend use
jax.config.update("jax_platforms", "cpu")

coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

jax.distributed.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)
assert len(jax.devices()) == 2 * nproc, jax.devices()

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from phastft_tpu import PlannerDit64  # noqa: E402
from phastft_tpu.parallel import default_mesh  # noqa: E402
from phastft_tpu.parallel.fourstep_dist import _build_distributed  # noqa: E402

n = 1 << 12
rng = np.random.default_rng(0)
re = rng.standard_normal(n)
im = rng.standard_normal(n)
planner = PlannerDit64(n)

mesh = default_mesh("x")
d = len(jax.devices())
run, mesh = _build_distributed(
    n, d, "x", planner.options.leaf_fft_size, False, False,
    tuple(mesh.devices.flat),
)
sharding = NamedSharding(mesh, P("x"))
gre = jax.make_array_from_callback((n,), sharding, lambda idx: re[idx])
gim = jax.make_array_from_callback((n,), sharding, lambda idx: im[idx])
out_re, out_im = run(gre, gim, planner.fast_tables, planner.leaf_corrs)

want = np.fft.fft(re + 1j * im)
ok = True
for sr, si in zip(out_re.addressable_shards, out_im.addressable_shards):
    got = np.asarray(sr.data) + 1j * np.asarray(si.data)
    wslice = want[sr.index]
    err = np.linalg.norm(got - wslice) / max(np.linalg.norm(wslice), 1e-30)
    if err > 1e-10:
        ok = False
        print(f"proc {pid} shard {sr.index}: err {err:.3e}", flush=True)
print(f"proc {pid}: {'OK' if ok else 'FAIL'}", flush=True)
sys.exit(0 if ok else 1)
