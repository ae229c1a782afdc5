"""Interleaved-complex <-> planar interop helpers.

Equivalent of /root/reference/src/complex_nums.rs (feature `complex-nums`):
`deinterleave` / `combine_re_im` plus the interleaved flat-scalar forms.
The reference keeps planar as the fast primary format and documents the
interleaved API as a copying convenience (src/lib.rs:48-49); the same holds
here — and on TPU, complex128 *cannot* exist on device, so the f64
interleaved API necessarily stages through host numpy while f32 stays
device-native (complex64 is supported).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["deinterleave", "combine_re_im", "interleave"]


def deinterleave(signal):
    """Split an interleaved sequence into (re, im).

    Accepts either a complex array or a flat real array of interleaved
    (re, im) scalar pairs. For the flat form, a trailing unpaired scalar is
    dropped — matching the reference's `chunks_exact(2)` semantics
    (src/complex_nums.rs:12-16, tested on odd lengths incl. 100500).
    """
    if np.iscomplexobj(signal):
        xp = jnp if isinstance(signal, jnp.ndarray) else np
        return xp.real(signal), xp.imag(signal)
    if isinstance(signal, np.ndarray) and signal.ndim == 1:
        from .. import native

        got = native.deinterleave(np.ascontiguousarray(signal))
        if got is not None:
            return got
    pairs = np.shape(signal)[-1] // 2
    flat = signal[..., : 2 * pairs]
    return flat[..., 0::2], flat[..., 1::2]


def combine_re_im(re, im):
    """Combine planar (re, im) into a complex array
    (src/complex_nums.rs:47-55). Device arrays combine on device (c64);
    f64 combines on host (c128 does not exist on TPU)."""
    if isinstance(re, jnp.ndarray) and re.dtype == jnp.float32:
        return jax_complex(re, im)
    re = np.asarray(re)
    im = np.asarray(im)
    if re.dtype == np.float32:
        return (re + 1j * im).astype(np.complex64)
    return re.astype(np.float64) + 1j * im.astype(np.float64)


def jax_complex(re, im):
    import jax.lax

    return jax.lax.complex(jnp.asarray(re), jnp.asarray(im))


def interleave(re, im):
    """Planar -> flat interleaved scalar array (inverse of the flat-form
    deinterleave)."""
    xp = jnp if isinstance(re, jnp.ndarray) else np
    stacked = xp.stack([re, im], axis=-1)
    return stacked.reshape(stacked.shape[:-2] + (-1,))
