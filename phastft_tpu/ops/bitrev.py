"""Bit-reversal permutation, TPU-style.

The reference implements the SPAA'07 BRAVO/CO-BRAVO algorithm
(/root/reference/src/algorithms/bravo.rs): cache-resident tiles + vector
interleaves. On TPU the same insight — "bit reversal factorizes into
tile-index reversal x intra-tile reversal" — maps onto reshape/transpose
rather than explicit tiles:

    with n = T * M * T (T = 2^t), index i = hi*(M*T) + mid*T + lo,
    rev(i) = rev_t(lo)*(M*T) + rev_m(mid)*T + rev_t(hi)

so the permutation is exactly

    x.reshape(T, M, T)  -> gather rows by rev_t
                        -> gather mid axis by rev_m
                        -> transpose (2, 1, 0)
                        -> gather rows by rev_t
                        -> reshape(-1)

Every gather lands on a *leading* axis (the lane axis is only moved by the
transpose, which XLA lowers to its native tiled transpose), which is the
layout-friendly formulation of CO-BRAVO's tile-pair swap dance
(src/algorithms/bravo.rs:200-218). A flat one-shot gather is kept as the
small-size strategy, mirroring the reference's scalar fallback for
n < W^2 (src/algorithms/bravo.rs:225-251).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "bit_reverse_indices",
    "apply_bit_reversal",
    "naive_bit_reversal",
]


@functools.lru_cache(maxsize=64)
def bit_reverse_indices(n: int) -> np.ndarray:
    """Host-side int32 table: ``idx[i] = reverse of i in log2(n) bits``.

    Uses the native host runtime (multithreaded C++) when available;
    otherwise the classic doubling recurrence, vectorized.
    """
    from .. import native

    got = native.bit_reverse_indices(n) if n >= (1 << 16) else None
    if got is not None:
        return got
    log_n = n.bit_length() - 1
    idx = np.zeros(1, dtype=np.int64)
    for _ in range(log_n):
        idx = np.concatenate([2 * idx, 2 * idx + 1])
        # After k rounds idx holds the k-bit reversals scaled up; the
        # standard trick: rev_{k+1} = [2*rev_k, 2*rev_k + 1] builds the
        # reversal of the *digit-reversed* radix; see naive check in tests.
    # The doubling above yields the bit-reversal permutation directly:
    # each round prepends the next bit at the least-significant position
    # of the reversed index.
    return idx.astype(np.int32)


def naive_bit_reversal(x: np.ndarray) -> np.ndarray:
    """Reference permutation via the recursive even/odd split, used only in
    tests (mirrors /root/reference/src/algorithms/bravo.rs:355-371)."""
    n = len(x)
    if n <= 1:
        return x.copy()
    return np.concatenate([naive_bit_reversal(x[0::2]), naive_bit_reversal(x[1::2])])


def _tile_split(log_n: int) -> tuple[int, int, int]:
    """Pick t (tile bits) and m (mid bits) with log_n = t + m + t, m >= 0.

    t capped at 7 so the tile axis is at most 128 (one lane group)."""
    t = min(7, log_n // 2)
    m = log_n - 2 * t
    return t, m, t


def apply_bit_reversal(x: jnp.ndarray, n: int, tiled: bool):
    """Permute the last axis of ``x`` (length ``n``) into bit-reversed order.

    ``tiled`` selects the CO-BRAVO-style factorized form; the flat form is a
    single gather. Both are pure functions of a statically-known ``n`` so
    everything constant-folds under jit.
    """
    log_n = n.bit_length() - 1
    if not tiled or log_n < 4:
        rev = jnp.asarray(bit_reverse_indices(n))
        return jnp.take(x, rev, axis=-1)

    t, m, _ = _tile_split(log_n)
    T, M = 1 << t, 1 << m
    rev_t = jnp.asarray(bit_reverse_indices(T))
    rev_m = jnp.asarray(bit_reverse_indices(M))

    batch = x.shape[:-1]
    y = x.reshape(batch + (T, M, T))
    # Gathers on leading (non-lane) axes only; the lane axis is moved by
    # one native transpose.
    y = jnp.take(y, rev_t, axis=-3)
    if m:
        y = jnp.take(y, rev_m, axis=-2)
    nb = len(batch)
    perm = tuple(range(nb)) + (nb + 2, nb + 1, nb)
    y = jnp.transpose(y, perm)
    y = jnp.take(y, rev_t, axis=-3)
    return y.reshape(batch + (n,))
