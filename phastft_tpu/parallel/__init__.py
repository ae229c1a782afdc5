"""Multi-chip execution: sharded batch FFTs and the distributed four-step.

The reference's only parallelism is shared-memory rayon fork-join over
halves of one array (/root/reference/src/parallel.rs) — there is no
distributed component at all (SURVEY §2 #13-14). The TPU-native
replacements are:

* batch sharding over a device mesh (zero communication; twiddles
  replicated) — ``parallel.batch``;
* a distributed four-step transform for sizes beyond one chip's HBM,
  with the global transposes mapped to ``jax.lax.all_to_all`` over
  ICI — ``parallel.fourstep_dist``;
* distributed real transforms (R2C/C2R) composing the half-length
  trick with the sharded four-step — ``parallel.real_dist``.
"""

from .batch import batch_fft_sharded, default_mesh
from .fourstep_dist import fft_distributed
from .real_dist import c2r_fft_distributed, r2c_fft_distributed

__all__ = [
    "batch_fft_sharded",
    "default_mesh",
    "fft_distributed",
    "r2c_fft_distributed",
    "c2r_fft_distributed",
]
