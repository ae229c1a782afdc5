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
    "build_r2c_fft_dd",
    "build_c2r_fft",
    "build_c2r_fft_dd",
    "build_c2r_composite",
    "build_c2r_composite_dd",
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
        even, odd = _deinterleave(signal, n)
        zre, zim = fft_rows(even, odd, plan, tables, corrs,
                            use_pallas=use_pallas, leaf_kernel=leaf_kernel,
                            col_engine=col_engine)
        return _untangle(zre, zim, twre, twim)

    return run


def _dd_split(x):
    """f64 -> (hi, lo) paired-f32 double-float representation (exact:
    lo = x - f64(hi) is representable because hi is x rounded to f32)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _dd_join(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _untangle_lazy_dd(zrh, zrl, zih, zil, twre, twim):
    """Forward untangle on the dd representation with LAZY (non-
    renormalizing) primitives, joined to f64 at the very end — the f64
    join sums hi+lo exactly, so the per-op renorms the round-5 first
    attempt paid (4.2 ms, slower than the 2.7 ms emulated-f64 form) are
    pure waste. Same math as :func:`_untangle`; all heavy ops at f32
    VPU rate. Error from laziness is ~2^-44 of operand scale — far
    inside the engine's ~1e-11 contract."""
    from .df64 import _dd_add_lazy, _dd_sub_lazy, dd_cmul_lazy

    half = zrh.shape[-1]
    q = half // 2

    def mirror(ah, al):
        mh = jnp.concatenate(
            [ah[..., :1], jnp.flip(ah[..., half - q:], axis=-1)], axis=-1
        )
        ml = jnp.concatenate(
            [al[..., :1], jnp.flip(al[..., half - q:], axis=-1)], axis=-1
        )
        return mh, ml

    mrh, mrl = mirror(zrh, zrl)
    mih, mil = mirror(zih, zil)
    mih, mil = -mih, -mil
    zkr, zkrl = zrh[..., : q + 1], zrl[..., : q + 1]
    zki, zkil = zih[..., : q + 1], zil[..., : q + 1]
    srh, srl = _dd_add_lazy(zkr, zkrl, mrh, mrl)
    sih, sil = _dd_add_lazy(zki, zkil, mih, mil)
    drh, drl = _dd_sub_lazy(zkr, zkrl, mrh, mrl)
    dih, dil = _dd_sub_lazy(zki, zkil, mih, mil)
    twrh, twrl = _dd_split(twre)
    twih, twil = _dd_split(twim)
    urh, url, uih, uil = dd_cmul_lazy(
        drh, drl, dih, dil, twrh, twrl, twih, twil
    )
    # 0.5 scale is exact per component (power of two)
    hsrh, hsrl = 0.5 * srh, 0.5 * srl
    hsih, hsil = 0.5 * sih, 0.5 * sil
    # X[k] = s/2 - i*u; X[half-k] = conj(s)/2 - i*conj(u); join lazily:
    # each output = exact f64 sum of 4 f32 terms
    def join4(ah, al, bh, bl, sign=1.0):
        return (
            (ah.astype(jnp.float64) + al.astype(jnp.float64))
            + sign * (bh.astype(jnp.float64) + bl.astype(jnp.float64))
        )

    xk_re = join4(hsrh, hsrl, uih, uil)
    xk_im = join4(hsih, hsil, urh, url, -1.0)
    xj_re = join4(hsrh, hsrl, uih, uil, -1.0)
    xj_im = join4(-hsih, -hsil, urh, url, -1.0)
    out_re = jnp.concatenate(
        [xk_re[..., :q], jnp.flip(xj_re, axis=-1)], axis=-1
    )
    out_im = jnp.concatenate(
        [xk_im[..., :q], jnp.flip(xj_im, axis=-1)], axis=-1
    )
    return out_re, out_im


def _r2c_post_engine() -> str:
    """Post-stage (untangle) engine for the dd R2C: "lazydd" (lazy dd
    ops at f32 VPU rate, f64 only in the final join) or "f64" (emulated
    f64 elementwise). PHASTFT_TPU_R2C_POST overrides the measured
    default."""
    import os

    v = os.environ.get("PHASTFT_TPU_R2C_POST", "")
    if v in ("lazydd", "f64"):
        return v
    return "lazydd"


def _pre_untangle_dd(xre, xim, twre, twim):
    """C2R preprocess in LAZY dd arithmetic: same uniform full-length
    form as :func:`_pre_untangle` (slice/flip operands only), f64
    touched once on the way in (the split). Outputs stay lazy (|lo| a
    few ulps) — the dd inverse FFT renormalizes once per radix step by
    design, so no renorm is paid here. Returns the dd z 4-tuple, fed
    straight into the dd inverse FFT — no join/resplit between stages."""
    from .df64 import _dd_add_lazy, _dd_sub_lazy, dd_cmul_lazy

    xrh, xrl = _dd_split(xre)
    xih, xil = _dd_split(xim)
    s_rh, s_rl = xrh[..., :-1], xrl[..., :-1]
    s_ih, s_il = xih[..., :-1], xil[..., :-1]
    b_rh = jnp.flip(xrh[..., 1:], axis=-1)
    b_rl = jnp.flip(xrl[..., 1:], axis=-1)
    b_ih = -jnp.flip(xih[..., 1:], axis=-1)
    b_il = -jnp.flip(xil[..., 1:], axis=-1)
    d_rh, d_rl = _dd_sub_lazy(s_rh, s_rl, b_rh, b_rl)
    d_ih, d_il = _dd_sub_lazy(s_ih, s_il, b_ih, b_il)
    s_rh, s_rl = _dd_add_lazy(s_rh, s_rl, b_rh, b_rl)
    s_ih, s_il = _dd_add_lazy(s_ih, s_il, b_ih, b_il)
    twrh, twrl = _dd_split(twre)
    twih, twil = _dd_split(-twim)  # conj(tw)
    prh, prl, pih, pil = dd_cmul_lazy(
        d_rh, d_rl, d_ih, d_il, twrh, twrl, twih, twil
    )
    # 0.5 scale exact per component
    z_rh, z_rl = _dd_sub_lazy(0.5 * s_rh, 0.5 * s_rl, pih, pil)
    z_ih, z_il = _dd_add_lazy(0.5 * s_ih, 0.5 * s_il, prh, prl)
    return z_rh, z_rl, z_ih, z_il


def _scale_interleave_dd(orh, orl, oih, oil, n: int, sel: bool = False):
    """Scale by 2/N and interleave, dd in / f64 out: the dilating
    interleave runs twice at f32 rate (hi, lo) and the single f64 pass
    is the final join write. ``sel=True`` uses the broadcast/where form
    instead of lax.pad — required when this is its own donated
    executable at n >= 2^22 (the pad form's compile goes pathological
    there; see _scale_interleave_sel)."""
    # 2/n is a power of two: exact componentwise, no dd renorm needed
    inv = jnp.float32(2.0 / n)
    orh, orl = orh * inv, orl * inv
    oih, oil = oih * inv, oil * inv
    batch = orh.shape[:-1]
    if n < 256:
        hi = jnp.stack([orh, oih], axis=-1).reshape(batch + (n,))
        lo = jnp.stack([orl, oil], axis=-1).reshape(batch + (n,))
        return _dd_join(hi, lo)
    nb = len(batch)
    rows = batch + (n // 256, 128)
    wide = batch + (n // 256, 256)
    if sel:
        even = (
            jax.lax.broadcasted_iota(jnp.int32, wide, len(wide) - 1) % 2
        ) == 0
        dup = lambda a: jnp.broadcast_to(  # noqa: E731
            a.reshape(rows)[..., None], rows + (2,)
        ).reshape(wide)

        def inter(ev, od):
            return jnp.where(even, dup(ev), dup(od)).reshape(batch + (n,))

    else:
        cfg = ((0, 0, 0),) * (nb + 1)
        zero = jnp.asarray(0, jnp.float32)

        def inter(ev, od):
            pe = jax.lax.pad(ev.reshape(rows), zero, cfg + ((0, 1, 1),))
            po = jax.lax.pad(od.reshape(rows), zero, cfg + ((1, 0, 1),))
            return (pe + po).reshape(batch + (n,))

    return _dd_join(inter(orh, oih), inter(orl, oil))


def _deinterleave(signal, n: int):
    """Split a length-n real row into (even, odd) halves via strided LANE
    slices on wide rows — a minor dim of 2 pads (8,128) tiles up to 64x
    (measured 37 ms vs 2 ms at 2^24 f64 on v5e for the two forms)."""
    batch = signal.shape[:-1]
    if n >= 256:
        rows = signal.reshape(batch + (n // 256, 256))
        even = rows[..., 0::2].reshape(batch + (n // 2,))
        odd = rows[..., 1::2].reshape(batch + (n // 2,))
    else:
        pairs = signal.reshape(batch + (n // 2, 2))
        even = pairs[..., 0]
        odd = pairs[..., 1]
    return even, odd


@functools.lru_cache(maxsize=128)
def build_r2c_fft_dd(n: int, leaf_limit: int, use_pallas=None, dd_leaf=None):
    """Forward R2C with the inner half-length FFT on the df64 (double-
    float) engine: (signal, dd_tables, dd_corrs, r2c_tw) -> (spec_re,
    spec_im) of length N/2+1.

    The reference runs R2C's inner FFT through the *same* optimized C2C
    entry as the public path (/root/reference/src/algorithms/r2c.rs:
    555-582) — that reuse is what makes R2C ~2x faster than zero-imag
    C2C (README.md:77-78). The TPU analog: the deinterleave and untangle
    stay f64 (each is one streaming pass), while the O(n log n) inner
    transform rides the paired-f32 dd pipeline (fused Pallas dd/Ozaki
    kernels, ops/pallas_dd.py / ops/pallas_ozdd.py)."""
    from .fourstep import fft_rows_dd

    plan = plan_rows(n // 2, leaf_limit)

    @jax.jit
    def run(signal, tables, corrs, twre, twim):
        # split FIRST (the only f64-reading pass), then deinterleave the
        # f32 components. (An in-kernel VMEM deinterleave — fusing this
        # pass into the oz column kernel — was built and CPU-validated
        # in round 5 but Mosaic has no strided lane access on v5e, so
        # it cannot lower; the XLA strided slice stays.)
        sh, sl = _dd_split(signal)
        rh, ih = _deinterleave(sh, n)
        rl, il = _deinterleave(sl, n)
        rh, rl, ih, il = fft_rows_dd(rh, rl, ih, il, plan, tables, corrs,
                                     use_pallas=use_pallas, dd_leaf=dd_leaf)
        # Post engines measured at 2^24 on v5e: renormalizing-dd 4.2 ms
        # < never; emulated f64 2.7 ms; LAZY dd (renorms skipped, f64
        # only in the exact final join) is the default — see
        # _r2c_post_engine / scratch/r5.
        if _r2c_post_engine() == "lazydd":
            return _untangle_lazy_dd(rh, rl, ih, il, twre, twim)
        zre = _dd_join(rh, rl)
        zim = _dd_join(ih, il)
        return _untangle(zre, zim, twre, twim)

    return run


@functools.lru_cache(maxsize=128)
def build_c2r_fft_dd(n: int, leaf_limit: int, use_pallas=None, dd_leaf=None):
    """Inverse C2R with the whole pipeline in dd arithmetic: preprocess,
    inverse half-length FFT (swap trick, dit.rs:291-300), scale and
    interleave all on paired f32; f64 is touched once on the way in
    (the split inside _pre_untangle_dd) and once on the way out (the
    interleave join)."""
    from .fourstep import fft_rows_dd

    plan = plan_rows(n // 2, leaf_limit)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(spec_re, spec_im, tables, corrs, twre, twim):
        z_rh, z_rl, z_ih, z_il = _pre_untangle_dd(
            spec_re, spec_im, twre, twim
        )
        # swap trick: feed (im, re), outputs come back swapped
        oih, oil, orh, orl = fft_rows_dd(
            z_ih, z_il, z_rh, z_rl, plan, tables, corrs,
            use_pallas=use_pallas, dd_leaf=dd_leaf,
        )
        return _scale_interleave_dd(orh, orl, oih, oil, n)

    return run


@functools.lru_cache(maxsize=128)
def build_c2r_composite_dd(n: int, leaf_limit: int, use_pallas=None,
                           dd_leaf=None):
    """Three-executable dd C2R for large n (see :func:`build_c2r_composite`
    for the XLA:TPU layout-analysis rationale); the dd representation
    crosses the executable boundaries, so no join/resplit is paid
    between stages."""
    from .fourstep import fft_rows_dd

    plan = plan_rows(n // 2, leaf_limit)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pre(spec_re, spec_im, twre, twim):
        return _pre_untangle_dd(spec_re, spec_im, twre, twim)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def body(z_rh, z_rl, z_ih, z_il, tables, corrs):
        oih, oil, orh, orl = fft_rows_dd(
            z_ih, z_il, z_rh, z_rl, plan, tables, corrs,
            use_pallas=use_pallas, dd_leaf=dd_leaf,
        )
        return orh, orl, oih, oil

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def post(orh, orl, oih, oil):
        return _scale_interleave_dd(orh, orl, oih, oil, n, sel=True)

    def run(spec_re, spec_im, tables, corrs, twre, twim):
        z = pre(spec_re, spec_im, twre, twim)
        o = body(*z, tables, corrs)
        return post(*o)

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
