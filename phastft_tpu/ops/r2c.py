"""Real-input (R2C) and real-output (C2R) transforms via the half-length
complex trick, producing/consuming the compact N/2+1 spectrum.

TPU-native re-design of /root/reference/src/algorithms/r2c.rs. The math is
identical (pack N reals into an N/2 complex FFT, then a conjugate-symmetric
"untangle" post-process with mirrored pairs so only N/4+1 twiddles are
needed); the expression is vectorized XLA instead of mirrored SIMD lanes:

  forward (r2c.rs:40-242):
    z      = FFT_{N/2}(even + i*odd)
    s[k]   = z[k] + conj(z[N/2-k]),  d[k] = z[k] - conj(z[N/2-k])
    u[k]   = tw[k] * d[k]            (tw = 0.5 * W_N^k, planner-folded 0.5)
    X[k]      = s[k]/2 - i*u[k]                      for k in [0, N/4]
    X[N/2-k]  = conj(s[k])/2 - i*conj(u[k])          for k in [0, N/4]

  inverse (r2c.rs:244-465):
    s'[k]  = X[k] + conj(X[N/2-k]),  d'[k] = X[k] - conj(X[N/2-k])
    z[k]      = s'[k]/2 + 2i*conj(tw[k]) * d'[k]/2   for k in [0, N/4)
    z[N/2-k]  = (A+B)/2 - 2i*tw[k]*(A-B)/2,  A = X[N/2-k], B = conj(X[k])
    signal = interleave(IFFT_{N/2}(z))

The reference's "zero allocations on the hot path" (output doubles as
scratch, README.md:82-84) translates to buffer donation: the inner FFT and
untangle run in-place in HBM on the donated output buffers.

DC and Nyquist bins fall out of the k=0 pair formula as purely real values
(tested, like r2c.rs:1308-1319). The self-pair bin at k = N/4 is produced
consistently by both half-formulas (r2c.rs:233-237).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fourstep import fft_rows, plan_rows

__all__ = [
    "build_r2c_fft",
    "build_c2r_fft",
    "build_c2r_composite",
    "C2R_COMPOSITE_MIN_N",
]

#: Above this size the eager public C2R path (real_fft._c2r) dispatches
#: the three-executable composite instead of the single fused program:
#: XLA:TPU's copy/layout analysis on {preprocess -> scan-chunked FFT ->
#: dilated interleave} in ONE program takes 20-30 minutes at n >= 2^22
#: (measured 1279 s at 2^22, 1735 s without the optimization barrier),
#: while the same stages as separate executables compile in ~1 minute
#: total (measured 3.5 s + 50.8 s at 2^23). Below the threshold the
#: fused program both compiles fine and saves two dispatches.
C2R_COMPOSITE_MIN_N = 1 << 22


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _untangle(zre, zim, twre, twim):
    """Forward untangle: half-length FFT output -> compact N/2+1 spectrum."""
    half = zre.shape[-1]
    q = half // 2
    # mirror m[k] = conj(z[(half - k) % half]) for k = 0..q, built from a
    # slice + reverse (index-array gathers lower catastrophically on TPU)
    mre = jnp.concatenate(
        [zre[..., :1], jnp.flip(zre[..., half - q :], axis=-1)], axis=-1
    )
    mim = -jnp.concatenate(
        [zim[..., :1], jnp.flip(zim[..., half - q :], axis=-1)], axis=-1
    )
    zkre, zkim = zre[..., : q + 1], zim[..., : q + 1]
    sre, sim = zkre + mre, zkim + mim
    dre, dim = zkre - mre, zkim - mim
    ure, uim = _cmul(dre, dim, twre, twim)
    # X[k] = s/2 - i*u  -> re = s_re/2 + u_im, im = s_im/2 - u_re
    xk_re = 0.5 * sre + uim
    xk_im = 0.5 * sim - ure
    # X[half-k] = conj(s)/2 - i*conj(u) -> re = s_re/2 - u_im, im = -s_im/2 - u_re
    xj_re = 0.5 * sre - uim
    xj_im = -0.5 * sim - ure
    out_re = jnp.concatenate(
        [xk_re[..., :q], jnp.flip(xj_re, axis=-1)], axis=-1
    )
    out_im = jnp.concatenate(
        [xk_im[..., :q], jnp.flip(xj_im, axis=-1)], axis=-1
    )
    return out_re, out_im


def _pre_untangle(xre, xim, twre, twim):
    """C2R preprocess: compact N/2+1 spectrum -> half-length complex z.

    Uniform over ALL k in [0, N/2):

        A[k] = X[k],  B[k] = conj(X[half - k])
        z[k] = (A+B)/2 + i * conj(tw[k]) * (A-B)      (tw = 0.5 * W_N^k)

    ``twre/twim`` is the FULL-length table (planner.c2r_twiddles, length
    N/2). The reference reuses N/4+1 twiddles with a mirrored second-half
    formula (r2c.rs:244-465); expressing that directly required a
    mid-array concatenate whose output fed the scan-chunked inner FFT —
    the exact structure that sent XLA:TPU copy/layout analysis into
    25-minute compiles at n >= 2^22. Here every operand is a full-length
    slice or flip, so nothing is stitched: X[half-k] for k in [0, half)
    is flip(x[..., 1:]), and the twiddle conjugate is a sign flip."""
    s_re, s_im = xre[..., :-1], xim[..., :-1]  # A = X[0 .. half-1]
    b_re = jnp.flip(xre[..., 1:], axis=-1)  # B = conj(X[half - k])
    b_im = -jnp.flip(xim[..., 1:], axis=-1)
    d_re, d_im = s_re - b_re, s_im - b_im
    s_re, s_im = s_re + b_re, s_im + b_im
    pr, pi = _cmul(d_re, d_im, twre, -twim)  # conj(tw) * d
    z_re = 0.5 * s_re - pi
    z_im = 0.5 * s_im + pr
    return z_re, z_im


@functools.lru_cache(maxsize=128)
def build_r2c_fft(n: int, leaf_limit: int, use_pallas=None,
                  leaf_kernel=None, col_engine=None):
    """Compiled forward R2C executable for size n: (signal, tables, corrs,
    r2c_tw) -> (spec_re, spec_im) of length N/2+1 (r2c.rs:521-593).
    The engine knobs (planner/per-call Options) are part of the cache key
    — they change the inner FFT's lowering."""
    plan = plan_rows(n // 2, leaf_limit)

    @jax.jit
    def run(signal, tables, corrs, twre, twim):
        batch = signal.shape[:-1]
        # Deinterleave via strided LANE slices on wide rows. Any shape
        # with a tiny minor dimension (e.g. (n/2, 2)) pads to (8,128)
        # tiles — up to 64x memory blowup; measured 37 ms vs 2 ms at
        # 2^24 f64 on v5e for the two forms.
        if n >= 256:
            rows = signal.reshape(batch + (n // 256, 256))
            even = rows[..., 0::2].reshape(batch + (n // 2,))
            odd = rows[..., 1::2].reshape(batch + (n // 2,))
        else:
            pairs = signal.reshape(batch + (n // 2, 2))
            even = pairs[..., 0]
            odd = pairs[..., 1]
        zre, zim = fft_rows(even, odd, plan, tables, corrs,
                            use_pallas=use_pallas, leaf_kernel=leaf_kernel,
                            col_engine=col_engine)
        return _untangle(zre, zim, twre, twim)

    return run


def _scale_interleave_sel(out_re, out_im, n: int):
    """Scale by 2/N and interleave via lane-duplication + parity select.

    Same result as :func:`_scale_interleave`, but expressed as pure
    broadcast/where (no lax.pad): as its own donated executable at
    n >= 2^22 the pad form compiles pathologically on XLA:TPU (>30 min
    measured at 2^23) while this form compiles in ~5 s. Used only by
    the large-n composite post stage; the fused small-n program keeps
    the pad form, which is measured-native there."""
    inv = jnp.asarray(2.0 / n, dtype=out_re.dtype)
    out_re = out_re * inv
    out_im = out_im * inv
    batch = out_re.shape[:-1]
    rows = batch + (n // 256, 128)
    re_rows = out_re.reshape(rows)
    im_rows = out_im.reshape(rows)
    wide = batch + (n // 256, 256)
    # duplicate each lane (v -> v v), then pick re on even output lanes
    # and im on odd ones: out[2k] = re[k], out[2k+1] = im[k]
    dup = lambda a: jnp.broadcast_to(  # noqa: E731
        a[..., None], rows + (2,)
    ).reshape(wide)
    even = (
        jax.lax.broadcasted_iota(jnp.int32, wide, len(wide) - 1) % 2
    ) == 0
    return jnp.where(even, dup(re_rows), dup(im_rows)).reshape(
        batch + (n,)
    )


def _scale_interleave(out_re, out_im, n: int):
    """Scale by 2/N and interleave planar halves into the real signal.

    Interleave via lane-dilating pads + add (native on TPU); the
    stack-minor-2 form pads tiles 64x (see the r2c side)."""
    inv = jnp.asarray(2.0 / n, dtype=out_re.dtype)
    out_re = out_re * inv
    out_im = out_im * inv
    batch = out_re.shape[:-1]
    if n >= 256:
        nb = len(batch)
        re_rows = out_re.reshape(batch + (n // 256, 128))
        im_rows = out_im.reshape(batch + (n // 256, 128))
        cfg = ((0, 0, 0),) * (nb + 1)
        zero = jnp.asarray(0, out_re.dtype)
        pe = jax.lax.pad(re_rows, zero, cfg + ((0, 1, 1),))
        po = jax.lax.pad(im_rows, zero, cfg + ((1, 0, 1),))
        return (pe + po).reshape(batch + (n,))
    return jnp.stack([out_re, out_im], axis=-1).reshape(batch + (n,))


@functools.lru_cache(maxsize=128)
def build_c2r_composite(n: int, leaf_limit: int, use_pallas=None,
                        leaf_kernel=None, col_engine=None):
    """Three-executable C2R for large n: same math and signature as
    :func:`build_c2r_fft`, but preprocess / inner FFT / interleave are
    separate compiled programs chained through donation.

    Rationale (measured on v5e, see C2R_COMPOSITE_MIN_N): XLA:TPU's
    copy/layout pass goes pathological (20-30 min compiles) when the
    scan-chunked inverse FFT sits between the untangle preprocess and
    the dilated interleave in one program. Splitting the stages
    restores ~1-minute compiles; donation keeps the HBM footprint the
    same as the fused form (each stage consumes its input buffers)."""
    plan = plan_rows(n // 2, leaf_limit)

    @jax.jit
    def pre(spec_re, spec_im, twre, twim):
        return _pre_untangle(spec_re, spec_im, twre, twim)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def body(z_re, z_im, tables, corrs):
        # inverse half-length FFT via swap trick (dit.rs:291-300)
        out_im, out_re = fft_rows(z_im, z_re, plan, tables, corrs,
                                  use_pallas=use_pallas,
                                  leaf_kernel=leaf_kernel,
                                  col_engine=col_engine)
        return out_re, out_im

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def post(out_re, out_im):
        return _scale_interleave_sel(out_re, out_im, n)

    def run(spec_re, spec_im, tables, corrs, twre, twim):
        z_re, z_im = pre(spec_re, spec_im, twre, twim)
        o_re, o_im = body(z_re, z_im, tables, corrs)
        return post(o_re, o_im)

    return run


@functools.lru_cache(maxsize=128)
def build_c2r_fft(n: int, leaf_limit: int, use_pallas=None,
                  leaf_kernel=None, col_engine=None):
    """Compiled inverse C2R executable for size n: (spec_re, spec_im,
    tables, corrs, c2r_tw) -> signal of length N (r2c.rs:695-799).

    ``twre/twim`` is the planner's FULL-length c2r_twiddles table (N/2
    entries) — see _pre_untangle for why.

    The inner inverse uses the swap trick + 2/N scale of the planar engine;
    scaling by 1/(N/2) makes C2R(R2C(x)) == x with no extra pass."""
    plan = plan_rows(n // 2, leaf_limit)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(spec_re, spec_im, tables, corrs, twre, twim):
        z_re, z_im = _pre_untangle(spec_re, spec_im, twre, twim)
        # inverse half-length FFT via swap trick (dit.rs:291-300)
        out_im, out_re = fft_rows(z_im, z_re, plan, tables, corrs,
                                  use_pallas=use_pallas,
                                  leaf_kernel=leaf_kernel,
                                  col_engine=col_engine)
        return _scale_interleave(out_re, out_im, n)

    return run
