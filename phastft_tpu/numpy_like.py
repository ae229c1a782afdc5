"""numpy.fft-compatible convenience layer.

`jnp.fft` cannot run on this TPU at all (no complex support in the
runtime), so this module gives `numpy.fft` users a drop-in surface backed
by the planar engines: `fft` / `ifft` / `rfft` / `irfft` with numpy's
axis and norm semantics (power-of-2 lengths only — the engine contract).

This is an extension beyond the reference (whose Python surface is the
single in-place `pyphastft.fft(reals, imags, dir)`,
/root/reference/pyphastft/src/lib.rs:18-44); it exists because on TPU
this library *is* the FFT runtime, not a binding.
"""

from __future__ import annotations

import numpy as np

from .errors import PhastftError
from .fft import (
    _cached_planner,
    fft_32_dit_with_planner,
    fft_64_dit_with_planner,
)
from .planner import Direction
from .real_fft import (
    c2r_fft_f32_with_planner,
    c2r_fft_f64_with_planner,
    r2c_fft_f32_with_planner,
    r2c_fft_f64_with_planner,
    _cached_planner as _cached_r2c_planner,
)

__all__ = [
    "fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
    "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
    "hfft", "ihfft",
    "fftfreq", "rfftfreq", "fftshift", "ifftshift",
]


def _norm_scale(norm, n: int, forward: bool) -> float:
    """Extra scale to apply on top of the engine's contract (forward
    unscaled, inverse 1/N) to honor numpy's norm conventions."""
    if norm is None or norm == "backward":
        return 1.0
    if norm == "ortho":
        return (1.0 / np.sqrt(n)) if forward else np.sqrt(n)
    if norm == "forward":
        return (1.0 / n) if forward else float(n)
    raise PhastftError(f"invalid norm: {norm!r}")


def _axis_last(a, axis):
    a = np.asarray(a)
    if axis not in (-1, a.ndim - 1):
        a = np.moveaxis(a, axis, -1)
    return a


def _axis_back(a, axis, ndim):
    if axis not in (-1, ndim - 1):
        return np.moveaxis(a, -1, axis)
    return a


def fft(a, n=None, axis=-1, norm=None):
    """Forward complex DFT, numpy.fft.fft semantics (power-of-2 n)."""
    a = _axis_last(np.asarray(a), axis)
    if n is not None and n != a.shape[-1]:
        raise PhastftError(
            "n must equal the input length (power-of-2 engine; pad first)"
        )
    m = a.shape[-1]
    single = a.dtype in (np.complex64, np.float32)
    if single:
        run, bits = fft_32_dit_with_planner, 32
        re = np.ascontiguousarray(a.real, np.float32)
        im = (np.ascontiguousarray(a.imag, np.float32)
              if np.iscomplexobj(a) else np.zeros_like(re))
    else:
        run, bits = fft_64_dit_with_planner, 64
        re = np.ascontiguousarray(a.real, np.float64)
        im = (np.ascontiguousarray(a.imag, np.float64)
              if np.iscomplexobj(a) else np.zeros_like(re))
    fre, fim = run(re, im, Direction.Forward, _cached_planner(m, bits))
    out = np.asarray(fre) + 1j * np.asarray(fim)
    if single:
        out = out.astype(np.complex64)
    s = _norm_scale(norm, m, forward=True)
    if s != 1.0:
        out = out * s
    return _axis_back(out, axis, out.ndim)


def ifft(a, n=None, axis=-1, norm=None):
    """Inverse complex DFT, numpy.fft.ifft semantics (1/N scaling)."""
    a = _axis_last(np.asarray(a), axis)
    if n is not None and n != a.shape[-1]:
        raise PhastftError(
            "n must equal the input length (power-of-2 engine; pad first)"
        )
    m = a.shape[-1]
    single = a.dtype in (np.complex64, np.float32)
    bits = 32 if single else 64
    dt = np.float32 if single else np.float64
    re = np.ascontiguousarray(a.real, dt)
    im = (np.ascontiguousarray(a.imag, dt) if np.iscomplexobj(a)
          else np.zeros_like(re))
    run = fft_32_dit_with_planner if single else fft_64_dit_with_planner
    fre, fim = run(re, im, Direction.Reverse, _cached_planner(m, bits))
    out = np.asarray(fre) + 1j * np.asarray(fim)
    if single:
        out = out.astype(np.complex64)
    s = _norm_scale(norm, m, forward=False)
    if s != 1.0:
        out = out * s
    return _axis_back(out, axis, out.ndim)


def _split_planar(a, single: bool):
    """(re, im) device arrays from a numpy/jax, real/complex input."""
    import jax.numpy as jnp

    dt = np.float32 if single else np.float64
    if np.iscomplexobj(a):
        a = np.asarray(a)
        re = jnp.asarray(np.ascontiguousarray(a.real), dt)
        im = jnp.asarray(np.ascontiguousarray(a.imag), dt)
    else:
        re = jnp.asarray(a, dt)
        im = jnp.zeros_like(re)
    return re, im


def _fftn_planar(a, s, axes, norm, forward: bool):
    """Shared device-resident N-D driver: the input is split into planar
    (re, im) device arrays once, every axis is transformed on-device
    (jnp.moveaxis + the planar executable, no host hop between axes),
    and the complex result is assembled on the host at the end — one
    device round trip total instead of one per axis (on a tunneled TPU
    each hop costs ~25 ms)."""
    import jax.numpy as jnp

    shape = np.shape(a)
    ndim = len(shape)
    if axes is None:
        axes = tuple(range(ndim))
    if s is not None and tuple(s) != tuple(shape[ax] for ax in axes):
        raise PhastftError(
            "s must match the input shape (power-of-2 engine; pad first)"
        )
    dtype = np.asarray(a).dtype if not hasattr(a, "dtype") else a.dtype
    single = dtype in (np.complex64, np.float32)
    run = fft_32_dit_with_planner if single else fft_64_dit_with_planner
    bits = 32 if single else 64
    direction = Direction.Forward if forward else Direction.Reverse
    re, im = _split_planar(a, single)
    scale = 1.0
    for ax in axes:
        m = shape[ax]
        last = ax in (-1, ndim - 1)
        if not last:
            re = jnp.moveaxis(re, ax, -1)
            im = jnp.moveaxis(im, ax, -1)
        re, im = run(re, im, direction, _cached_planner(m, bits))
        if not last:
            re = jnp.moveaxis(re, -1, ax)
            im = jnp.moveaxis(im, -1, ax)
        scale *= _norm_scale(norm, m, forward=forward)
    out = np.asarray(re) + 1j * np.asarray(im)
    if single:
        out = out.astype(np.complex64)
    if scale != 1.0:
        out = out * scale
    return out


def fftn(a, s=None, axes=None, norm=None):
    """N-dimensional DFT as a separable sequence of 1-D transforms
    (numpy.fft.fftn semantics; every transformed length power-of-2).
    Data stays on device across axes; numpy or jax arrays accepted."""
    return _fftn_planar(a, s, axes, norm, forward=True)


def ifftn(a, s=None, axes=None, norm=None):
    """N-dimensional inverse DFT (numpy.fft.ifftn semantics). Data stays
    on device across axes; numpy or jax arrays accepted."""
    return _fftn_planar(a, s, axes, norm, forward=False)


def fft2(a, s=None, axes=(-2, -1), norm=None):
    """2-D DFT over the last two axes (numpy.fft.fft2 semantics)."""
    return fftn(a, s=s, axes=axes, norm=norm)


def ifft2(a, s=None, axes=(-2, -1), norm=None):
    """2-D inverse DFT over the last two axes."""
    return ifftn(a, s=s, axes=axes, norm=norm)


def rfft(a, n=None, axis=-1, norm=None):
    """Real-input DFT -> compact N/2+1 spectrum, numpy.fft.rfft semantics."""
    a = _axis_last(np.asarray(a), axis)
    if n is not None and n != a.shape[-1]:
        raise PhastftError(
            "n must equal the input length (power-of-2 engine; pad first)"
        )
    m = a.shape[-1]
    single = a.dtype == np.float32
    if single:
        sre, sim = r2c_fft_f32_with_planner(
            np.ascontiguousarray(a, np.float32), _cached_r2c_planner(m, 32)
        )
    else:
        sre, sim = r2c_fft_f64_with_planner(
            np.ascontiguousarray(a, np.float64), _cached_r2c_planner(m, 64)
        )
    out = np.asarray(sre) + 1j * np.asarray(sim)
    if single:
        out = out.astype(np.complex64)
    s = _norm_scale(norm, m, forward=True)
    if s != 1.0:
        out = out * s
    return _axis_back(out, axis, out.ndim)


def irfft(a, n=None, axis=-1, norm=None):
    """Inverse of rfft -> real signal of length n = 2*(m-1)."""
    a = _axis_last(np.asarray(a), axis)
    m = a.shape[-1]
    full = 2 * (m - 1)
    if n is not None and n != full:
        raise PhastftError(
            f"n must equal 2*(len-1) = {full} (power-of-2 engine)"
        )
    single = a.dtype == np.complex64
    dt = np.float32 if single else np.float64
    sre = np.ascontiguousarray(a.real, dt)
    sim = np.ascontiguousarray(a.imag, dt)
    if single:
        sig = c2r_fft_f32_with_planner(sre, sim, _cached_r2c_planner(full, 32))
    else:
        sig = c2r_fft_f64_with_planner(sre, sim, _cached_r2c_planner(full, 64))
    out = np.asarray(sig)
    s = _norm_scale(norm, full, forward=False)
    if s != 1.0:
        out = out * s
    return _axis_back(out, axis, out.ndim)


def rfftn(a, s=None, axes=None, norm=None):
    """N-dimensional real-input DFT (numpy.fft.rfftn semantics): a real
    transform over the last of ``axes``, complex transforms over the
    rest. Per-axis norm scaling composes to numpy's prod(s) convention."""
    a = np.asarray(a)
    if axes is None:
        axes = tuple(range(a.ndim))
    if s is not None and tuple(s) != tuple(a.shape[ax] for ax in axes):
        raise PhastftError(
            "s must match the input shape (power-of-2 engine; pad first)"
        )
    out = rfft(a, axis=axes[-1], norm=norm)
    if len(axes) > 1:
        out = fftn(out, axes=axes[:-1], norm=norm)
    return out


def irfftn(a, s=None, axes=None, norm=None):
    """Inverse of rfftn -> real output (numpy.fft.irfftn semantics)."""
    a = np.asarray(a)
    if axes is None:
        axes = tuple(range(a.ndim))
    if s is not None:
        full = 2 * (a.shape[axes[-1]] - 1)
        want = tuple(
            full if ax == axes[-1] else a.shape[ax] for ax in axes
        )
        if tuple(s) != want:
            raise PhastftError(
                "s must match the transform shape (power-of-2 engine)"
            )
    if len(axes) > 1:
        a = ifftn(a, axes=axes[:-1], norm=norm)
    return irfft(a, axis=axes[-1], norm=norm)


def rfft2(a, s=None, axes=(-2, -1), norm=None):
    """2-D real-input DFT (numpy.fft.rfft2 semantics)."""
    return rfftn(a, s=s, axes=axes, norm=norm)


def irfft2(a, s=None, axes=(-2, -1), norm=None):
    """Inverse of rfft2 (numpy.fft.irfft2 semantics)."""
    return irfftn(a, s=s, axes=axes, norm=norm)


def hfft(a, n=None, axis=-1, norm=None):
    """DFT of a signal with Hermitian symmetry -> real spectrum
    (numpy.fft.hfft semantics): hfft(a) == irfft(conj(a)) * n, riding the
    C2R engine."""
    a = np.asarray(a)
    m = np.shape(a)[axis]
    full = 2 * (m - 1)
    if n is not None and n != full:
        raise PhastftError(
            f"n must equal 2*(len-1) = {full} (power-of-2 engine)"
        )
    out = irfft(np.conj(a), axis=axis, norm=None) * full
    s = _norm_scale(norm, full, forward=True)
    if s != 1.0:
        out = out * s
    return out


def ihfft(a, n=None, axis=-1, norm=None):
    """Inverse of hfft (numpy.fft.ihfft semantics): conj(rfft(a)) / n."""
    a = np.asarray(a)
    m = np.shape(a)[axis]
    if n is not None and n != m:
        raise PhastftError(
            "n must equal the input length (power-of-2 engine; pad first)"
        )
    out = np.conj(rfft(a, axis=axis, norm=None)) / m
    s = _norm_scale(norm, m, forward=False)
    if s != 1.0:
        out = out * s
    return out


# -- helper family: pure-host index/frequency utilities (numpy parity) --

def fftfreq(n, d=1.0):
    """numpy.fft.fftfreq: DFT sample frequencies."""
    return np.fft.fftfreq(n, d)


def rfftfreq(n, d=1.0):
    """numpy.fft.rfftfreq: sample frequencies of the compact spectrum."""
    return np.fft.rfftfreq(n, d)


def fftshift(x, axes=None):
    """numpy.fft.fftshift: move the zero-frequency bin to the center."""
    return np.fft.fftshift(x, axes)


def ifftshift(x, axes=None):
    """numpy.fft.ifftshift: undo fftshift."""
    return np.fft.ifftshift(x, axes)
