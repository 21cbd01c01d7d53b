"""Two-pass four-step FFT for large n (2^15..2^21): the round-2 fast path.

The XLA einsum pipeline (algos/split_stockham.py) makes ~6 HBM passes
at n=1M (3 stage matmuls + 2 twiddle passes + the digit-reversal
transpose). A 1M-point f32 split transform can't be done in fewer than
TWO passes on a 16 MB-VMEM chip (8 MB data + workspace), and this
kernel achieves exactly two:

  pass 1  grid (C2, B): DMA a strided column slab x[b, :, c2*128+l]
          (all j1, one 128-lane j2 chunk), run the length-L1 column FFT
          entirely in VMEM, multiply the four-step twiddle W_n^{k1*j2}
          (precomputed f64->f32, fetched once per c2 because b is the
          inner grid dim), write back [b, k1, j2].
  pass 2  grid (G1, B): DMA a contiguous row slab [one 128-lane k1
          chunk, all j2], transpose in VMEM, run the length-L2 column
          FFT, write [b, k2, k1] — which flattens to the NATURAL
          spectrum order (k = k2*L1 + k1) with zero XLA fixup passes.

The in-VMEM column FFT of length L = fa*fb is two MXU contractions with
a twiddle between — and the second contraction's dot_general output
axis order (k_b, k_a, lane) IS the digit reversal, so natural order
falls out free:

    j1 = j1a*fb + j1b,  k1 = k1a + fa*k1b
    S[k1a, j1b, l] = sum_{j1a} Fa[k1a, j1a] x[j1a, j1b, l]      (MXU)
    T = S * W_L^{k1a*j1b}                                       (VPU)
    Y[k1b, k1a, l] = sum_{j1b} Fb[k1b, j1b] T[k1a, j1b, l]      (MXU)
    flatten(k1b, k1a) = k1b*fa + k1a = k1  (natural)

All tables are f64-precomputed constants; matmuls run at HIGHEST
precision (TPU f32 matmuls default to bf16 passes — docs/performance.md).
Reference anchors: the four-step loop structure parallel_fft.c:213-272;
the empty custom-kernel TODO this replaces, fft_cuda.cu:264-266.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.twiddle import dft_matrix_np
from fftlab.core.types import Direction, FORWARD, is_power_of_two, log2_int

LANES = 128


def _mxu_precision() -> str:
    """MXU pass count for the f32 DFT contractions. "highest" = 6 bf16
    passes per f32 matmul (the default — SNR 130+ dB on device);
    FFTLAB_MXU_PRECISION=3x opts into a HAND-ROLLED bf16_3x (Mosaic
    rejects lax.Precision.HIGH outright — "Unsupported dot precision",
    r4 prec probe): both operands split into bf16 hi + lo planes, the
    three significant cross products run at DEFAULT precision (one MXU
    pass each), the negligible lo*lo term is dropped — HALF the MXU
    time of HIGHEST at ~f32 accuracy. The resident kernels sit near
    the compute/memory crossover at 2^20, so the pass count is a 1M
    roofline lever gated on the counted A/B's SNR (>=100 dB). Read
    once at import: A/B candidates launch as separate processes (same
    pattern as the other FFTLAB_* kernel knobs)."""
    import os

    v = os.environ.get("FFTLAB_MXU_PRECISION", "highest").lower()
    return "3x" if v in ("3x", "high") else "highest"


_PREC_MODE = _mxu_precision()
_P = jax.lax.Precision.HIGHEST


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mdot(a, b, mode: str | None = None):
    """jnp.dot at the configured MXU pass count (f32 accumulate)."""
    if (mode or _PREC_MODE) == "highest":
        return jnp.dot(a, b, precision=_P,
                       preferred_element_type=jnp.float32)
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    f32 = jnp.float32
    return (jnp.dot(ah, bh, preferred_element_type=f32)
            + jnp.dot(ah, bl, preferred_element_type=f32)
            + jnp.dot(al, bh, preferred_element_type=f32))


def _mdotg(a, b, dn, mode: str | None = None):
    """lax.dot_general at the configured MXU pass count."""
    if (mode or _PREC_MODE) == "highest":
        return jax.lax.dot_general(a, b, dn, precision=_P,
                                   preferred_element_type=jnp.float32)
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    f32 = jnp.float32
    return (jax.lax.dot_general(ah, bh, dn, preferred_element_type=f32)
            + jax.lax.dot_general(ah, bl, dn, preferred_element_type=f32)
            + jax.lax.dot_general(al, bh, dn, preferred_element_type=f32))

MIN_N = 1 << 15       # below this the fft_vmem/einsum paths win
# Per-pass VMEM budget bounds the sides: a pass holds in+out+twiddle
# slabs x 2 planes x Pallas double-buffering = 12 slabs of L*128*4 B.
# L = 2048 -> 12 MB (fits); L = 4096 -> 24 MB (compile fails with the
# remote service's HTTP 500). So n caps at 2048 * 2048 = 2^22; larger
# sizes route to the einsum path until a 3-pass scheme lands.
# 2^22 compiled once as a single transform in r2 but CRASHES the
# backend compiler at batch>1 (HTTP 500, r4 wisdom sweep: (4, 2^22) —
# the L=2048 pass slabs sit at the documented 12-slab VMEM compile
# ceiling and batched operands push past it). The three-pass kernel
# (threestep_vmem, MIN_N3=2^21) owns 2^22 instead.
MAX_N = 1 << 21


def supported_large(n: int) -> bool:
    return is_power_of_two(n) and MIN_N <= n <= MAX_N


def _split_sides(n: int) -> tuple[int, int]:
    """n = L1*L2, both pow2, L1 <= L2, both multiples of 128."""
    e = log2_int(n)
    e1 = e // 2
    L1 = 1 << e1
    return L1, n // L1


def _split_factors(L: int) -> tuple[int, int]:
    """L = fa*fb with both <= 128 (MXU-shaped contractions)."""
    e = log2_int(L)
    fa = 1 << (e // 2)
    return fa, L // fa


def _col_fft_tables(L: int, direction: Direction,
                    scale: float | None = None,
                    factors: tuple[int, int] | None = None):
    """Host tables for the in-VMEM length-L column FFT: Fa, Fb, and the
    inter-stage twiddle W_L^{k1a*j1b} (all float64 -> float32).

    `scale` folds a normalization into Fb (the final contraction of the
    LAST pass): an output scaling that would otherwise cost a whole
    read+write HBM pass (the reference's separate 1/n loop,
    radix2_dit.c:115-119) becomes free — fold it only into the last
    pass's tables.

    `factors` overrides the balanced (fa, fb) split — the
    lane-contraction form (_col_fft_lanes) needs fb pinned to the lane
    width so stage A contracts whole slots."""
    fa, fb = _split_factors(L) if factors is None else factors
    assert fa * fb == L, (fa, fb, L)
    Fa = dft_matrix_np(fa, direction)
    Fb = dft_matrix_np(fb, direction)
    if scale is not None:
        Fb = Fb * float(scale)
    ka = np.arange(fa).reshape(fa, 1)
    jb = np.arange(fb).reshape(1, fb)
    tw = np.exp(2j * np.pi * float(int(direction)) * ka * jb / L)
    c = lambda a: jnp.asarray(np.ascontiguousarray(a).astype(np.float32))
    return (c(Fa.real), c(Fa.imag), c(Fb.real), c(Fb.imag),
            c(tw.real), c(tw.imag))


def _col_fft_vmem(xr, xi, tabs, fa: int, fb: int,
                  prec: str | None = None):
    """(L, W) block -> (L, W) spectra along sublanes, natural order.
    W = lane width of the block (128 in pass 1, 128 in pass 2)."""
    Far, Fai, Fbr, Fbi, twr, twi = tabs
    L = fa * fb
    W = xr.shape[-1]
    x3r = xr.reshape(fa, fb * W)
    x3i = xi.reshape(fa, fb * W)
    # stage A: contract j1a (axis 0) -> S[k1a, j1b*W]
    sr = (_mdot(Far, x3r, prec)
          - _mdot(Fai, x3i, prec))
    si = (_mdot(Far, x3i, prec)
          + _mdot(Fai, x3r, prec))
    # twiddle W_L^{k1a*j1b}: broadcast over lanes
    sr3 = sr.reshape(fa, fb, W)
    si3 = si.reshape(fa, fb, W)
    wr = twr.reshape(fa, fb, 1)
    wi = twi.reshape(fa, fb, 1)
    tr = sr3 * wr - si3 * wi
    ti = sr3 * wi + si3 * wr
    # stage B: contract j1b (middle axis) -> Y[k1b, k1a, W]; the output
    # axis order performs the digit reversal, so flatten = natural k1.
    dn = (((1,), (1,)), ((), ()))  # contract Fb axis1 with T axis1
    yr = (_mdotg(Fbr, tr, dn, prec)
          - _mdotg(Fbi, ti, dn, prec))
    yi = (_mdotg(Fbr, ti, dn, prec)
          + _mdotg(Fbi, tr, dn, prec))
    return yr.reshape(L, W), yi.reshape(L, W)


def _col_fft_lanes(x3r, x3i, tabs, fa: int, fb: int,
                   prec: str | None = None):
    """Length-L FFT over the SPLIT axes of an (fa, M, fb) stack.

    The transform index is j = ja*fb + jb with ja the LEADING (slot)
    axis and jb the LANE axis: stage A contracts the slot axis, stage B
    contracts the lane axis, and the (L, M) natural-order output lands
    with M on lanes — the corner turn a (M, L)-oriented input would
    otherwise need rides the MXU contraction axes instead of a physical
    VMEM transpose (dot_general picks which axis contracts; a transpose
    of the operand is free at the instruction level).

    Tables MUST be built with _col_fft_tables(L, dir, factors=(fa, fb))
    where fb = the stack's lane width (128 in the resident kernels).
    Same math as _col_fft_vmem — natural order by output axis order —
    at 8*(L/fb + fb) flops/pt instead of the balanced 16*sqrt(L): the
    unbalanced split trades MXU flops (plentiful) for zero relayouts
    (the measured bottleneck — docs/performance.md, the v2->v4 arc)."""
    Far, Fai, Fbr, Fbi, twr, twi = tabs
    fa_, M, fb_ = x3r.shape
    assert fa_ == fa and fb_ == fb, (x3r.shape, fa, fb)
    # stage A: contract ja (the slot axis) — same (small, small) x
    # (small, wide) jnp.dot shape the column form uses, via a
    # trailing-collapse reshape
    x2r = x3r.reshape(fa, M * fb)
    x2i = x3i.reshape(fa, M * fb)
    sr = (_mdot(Far, x2r, prec)
          - _mdot(Fai, x2i, prec))
    si = (_mdot(Far, x2i, prec)
          + _mdot(Fai, x2r, prec))
    # twiddle W_L^{ka*jb}: (fa, fb) broadcast over the middle axis
    sr3 = sr.reshape(fa, M, fb)
    si3 = si.reshape(fa, M, fb)
    wr = twr.reshape(fa, 1, fb)
    wi = twi.reshape(fa, 1, fb)
    tr = sr3 * wr - si3 * wi
    ti = sr3 * wi + si3 * wr
    # stage B: contract jb (the LANE axis) -> (kb, ka, M); flattening
    # (kb, ka) performs the digit reversal, so the result is natural k
    # on sublanes with M on lanes.
    dn = (((1,), (2,)), ((), ()))
    yr = (_mdotg(Fbr, tr, dn, prec)
          - _mdotg(Fbi, ti, dn, prec))
    yi = (_mdotg(Fbr, ti, dn, prec)
          + _mdotg(Fbi, tr, dn, prec))
    return yr.reshape(fa * fb, M), yi.reshape(fa * fb, M)


def _row_fft_lanes(xr, xi, tabs, fa: int, fb: int,
                   prec: str | None = None):
    """Length-L FFT along the LANE axis of an (M, L) slab, output
    (L, M) natural order — the row-slab counterpart of _col_fft_lanes.

    The j = ja*fb + jb split must have fb = a multiple of 128 so the
    (M, L) -> (M, fa, fb) lane split is tile-aligned (free). Stage A
    contracts ja through the proven middle-axis dot_general pattern,
    stage B contracts the lane axis; the (L, M) corner turn the caller
    would otherwise do as a physical VMEM transpose (threestep pass 3)
    rides the contraction axes. Tables: _col_fft_tables(L, dir,
    factors=(fa, fb))."""
    Far, Fai, Fbr, Fbi, twr, twi = tabs
    M, L = xr.shape
    assert fa * fb == L, (fa, fb, L)
    x3r = xr.reshape(M, fa, fb)
    x3i = xi.reshape(M, fa, fb)
    dnA = (((1,), (1,)), ((), ()))   # Fa (fa,fa) x (M, fa, fb) -> (fa, M, fb)
    sr = (_mdotg(Far, x3r, dnA, prec)
          - _mdotg(Fai, x3i, dnA, prec))
    si = (_mdotg(Far, x3i, dnA, prec)
          + _mdotg(Fai, x3r, dnA, prec))
    wr = twr.reshape(fa, 1, fb)
    wi = twi.reshape(fa, 1, fb)
    tr = sr * wr - si * wi
    ti = sr * wi + si * wr
    dnB = (((1,), (2,)), ((), ()))   # Fb (fb,fb) x (fa, M, fb) -> (fb, fa, M)
    yr = (_mdotg(Fbr, tr, dnB, prec)
          - _mdotg(Fbi, ti, dnB, prec))
    yi = (_mdotg(Fbr, ti, dnB, prec)
          + _mdotg(Fbi, tr, dnB, prec))
    return yr.reshape(L, M), yi.reshape(L, M)


def _pass1_kernel(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                  ar_ref, ai_ref, pr_ref, pi_ref,
                  or_ref, oi_ref, *, fa, fb):
    """Column FFT + fused four-step twiddle in RANK-1 form:
    W_n^{k1*(c*W + l)} = W_n^{k1*c*W} * W_n^{k1*l} = A_c[k1] * P[k1, l].
    A arrives as a per-block (L1, 1) column (blocked (C2, L1, 1) spec —
    bytes per block, not a full slab) and P is one fixed (L1, W) const,
    so the twiddle costs ~zero HBM traffic and no VMEM slab — the
    headroom goes to wider DMA bursts instead.

    Shape-agnostic over leading singleton block dims: the in/out refs
    may be (1, L, W) row-major or (1, 1, L, W) blocked slabs."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    L, W = xr_ref.shape[-2:]
    yr, yi = _col_fft_vmem(xr_ref[...].reshape(L, W),
                           xi_ref[...].reshape(L, W), tabs, fa, fb)
    ar = ar_ref[...].reshape(L, 1)
    ai = ai_ref[...].reshape(L, 1)
    pr = pr_ref[...]        # (L, W)
    pi = pi_ref[...]
    wr = ar * pr - ai * pi  # complex rank-1 product
    wi = ar * pi + ai * pr
    or_ref[...] = (yr * wr - yi * wi).reshape(or_ref.shape)
    oi_ref[...] = (yr * wi + yi * wr).reshape(oi_ref.shape)


def _unblock_mid(xref, R2: int):
    """Blocked-mid block (1, C2, R2, W1) -> (L2, R2) with j2 on
    sublanes: x[0, c, r, l] = M[k1 = g*R2 + r, j2 = c*W1 + l] and the
    column FFT wants M^T[j2, r]."""
    _, C2, _, W1 = xref.shape
    x3 = xref[...].reshape(C2, R2, W1)
    return jnp.transpose(x3, (0, 2, 1)).reshape(C2 * W1, R2)


def _pass2_load(xr_ref, xi_ref, S2: int):
    """Load a pass-2 input block as the (S2, R2) column matrix. Handles
    both the row-major (1, R2, S2) slab (VMEM transpose) and the blocked
    (1, C2, R2, W1) slab (_unblock_mid)."""
    if xr_ref.ndim == 3:
        R2 = xr_ref.shape[-2]
        xr = jnp.transpose(xr_ref[...].reshape(R2, S2), (1, 0))
        xi = jnp.transpose(xi_ref[...].reshape(R2, S2), (1, 0))
    else:
        R2 = xr_ref.shape[-2]
        xr = _unblock_mid(xr_ref, R2)
        xi = _unblock_mid(xi_ref, R2)
    return xr, xi


def _pass2_kernel(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                  or_ref, oi_ref, *, fa, fb):
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    S2 = fa * fb
    xr, xi = _pass2_load(xr_ref, xi_ref, S2)
    yr, yi = _col_fft_vmem(xr, xi, tabs, fa, fb)
    or_ref[...] = yr.reshape(or_ref.shape)
    oi_ref[...] = yi.reshape(oi_ref.shape)


def _pass2_lanes_load(xr_ref, xi_ref, fa: int, fb: int):
    """Pass-2 input as an (fa, M, fb) lane-contraction stack — the
    transpose-free counterpart of _pass2_load. The blocked slab
    (1, C2, R2, W1) IS the stack when fb = W1 (ja = the lane-block
    index c); the row-major slab (1, R2, L2) lane-splits tile-aligned
    and goes through _row_fft_lanes' layout instead."""
    if xr_ref.ndim == 3:                       # (1, R2, L2) row-major
        _, R2, L2 = xr_ref.shape
        return (xr_ref[...].reshape(R2, L2),
                xi_ref[...].reshape(R2, L2), True)
    _, C2, R2, W1 = xr_ref.shape               # blocked
    assert C2 == fa and W1 == fb, (xr_ref.shape, fa, fb)
    return (xr_ref[...].reshape(C2, R2, W1),
            xi_ref[...].reshape(C2, R2, W1), False)


def _pass2_lanes_kernel(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                        or_ref, oi_ref, *, fa, fb):
    """Pass 2 without the in-VMEM corner turn: the length-L2 FFT
    contracts the slab's lane-side digit axes directly
    (_col_fft_lanes/_row_fft_lanes), so _unblock_mid's per-tile
    transposes / the row-major whole-slab transpose disappear.
    Tables must be built with factors=(fa, fb)."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    xr, xi, rowmajor = _pass2_lanes_load(xr_ref, xi_ref, fa, fb)
    if rowmajor:
        yr, yi = _row_fft_lanes(xr, xi, tabs, fa, fb)
    else:
        yr, yi = _col_fft_lanes(xr, xi, tabs, fa, fb)
    or_ref[...] = yr.reshape(or_ref.shape)
    oi_ref[...] = yi.reshape(oi_ref.shape)


def _pass2_filter_lanes_kernel(xr_ref, xi_ref,
                               Far, Fai, Fbr, Fbi, Twr, Twi,
                               hr_ref, hi_ref, or_ref, oi_ref, *, fa, fb):
    """_pass2_lanes_kernel with the spectral response fused into the
    epilogue (the _pass2_filter_kernel counterpart)."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    xr, xi, rowmajor = _pass2_lanes_load(xr_ref, xi_ref, fa, fb)
    if rowmajor:
        yr, yi = _row_fft_lanes(xr, xi, tabs, fa, fb)
    else:
        yr, yi = _col_fft_lanes(xr, xi, tabs, fa, fb)
    hr = hr_ref[...].reshape(yr.shape)
    hi = hi_ref[...].reshape(yr.shape)
    or_ref[...] = (yr * hr - yi * hi).reshape(or_ref.shape)
    oi_ref[...] = (yr * hi + yi * hr).reshape(oi_ref.shape)


def _pass2_filter_kernel(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                         hr_ref, hi_ref, or_ref, oi_ref, *, fa, fb):
    """Pass 2 with the spectral response fused into the epilogue: the
    output IS the natural-order spectrum, so multiplying the natural-
    order H block here costs zero extra passes (H fetch amortizes over
    the batch like the pass-1 twiddle)."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    S2 = fa * fb
    xr, xi = _pass2_load(xr_ref, xi_ref, S2)
    yr, yi = _col_fft_vmem(xr, xi, tabs, fa, fb)
    hr = hr_ref[...].reshape(yr.shape)
    hi = hi_ref[...].reshape(yr.shape)
    or_ref[...] = (yr * hr - yi * hi).reshape(or_ref.shape)
    oi_ref[...] = (yr * hi + yi * hr).reshape(oi_ref.shape)


def _rank1_twiddle_np(L1: int, L2: int, W: int, direction: Direction):
    """The pass-1 twiddle W_n^{k1*j2} split along j2 = c*W + l:
    A[c, k1] = W_n^{k1*c*W},  P[k1, l] = W_n^{k1*l}  (both float64).
    Returns (A as (C, L1, 1), P as (L1, W))."""
    n = L1 * L2
    C = L2 // W
    k1 = np.arange(L1, dtype=np.int64)
    c = np.arange(C, dtype=np.int64)
    l = np.arange(W, dtype=np.int64)
    s = 2j * np.pi * float(int(direction)) / n
    A = np.exp(s * ((c[:, None] * W * k1[None, :]) % n))  # (C, L1)
    P = np.exp(s * ((k1[:, None] * l[None, :]) % n))      # (L1, W)
    return A.reshape(C, L1, 1), P


def _env_width() -> int | None:
    """FFTLAB_FS_WIDTH, resolved OUTSIDE jit (a static cache key —
    resolving at trace time would let a stale cached compilation
    silently ignore later env changes). None when unset."""
    import os

    forced = os.environ.get("FFTLAB_FS_WIDTH")
    if forced is None:
        return None
    w = int(forced)
    if w % LANES:
        raise ValueError(
            f"FFTLAB_FS_WIDTH={w} must be a multiple of {LANES}")
    return w


def _clamp_width(w: int, side: int) -> int:
    """Largest multiple-of-LANES divisor of `side` that is <= w. The
    FFTLAB_FS_WIDTH knob sets ONE width for both passes, but W1 chunks
    L2 while R2 chunks L1 — on non-square splits the forced value can
    fit one pass and not the other, so each pass clamps independently
    (same sweep-friendly semantics as threestep's FFTLAB_TS_W1/R3)."""
    while side % w and w > LANES:
        w //= 2
    return w if (side % w == 0 and w % LANES == 0) else LANES


def _blk_width(L: int) -> int:
    """Lane-block width for a pass over side L: wider = bigger DMA
    bursts (strided 512 B bursts are a candidate for the gap to the
    2-pass roofline floor), but every doubling doubles the VMEM slab
    budget (6 slabs x L*W*4 B, double-buffered, + kernel temporaries).
    Default keeps the compile-proven 128 for L >= 1024; growing is a
    device-tuning knob via FFTLAB_FS_WIDTH (resolved by the public
    entry points via `_env_width`, outside jit)."""
    return 256 if L <= 512 else LANES


def _blocked_mid_default() -> bool:
    """Blocked-intermediate layout switch (FFTLAB_FS_BLOCKED=0 disables).

    With the (B, L1, L2) intermediate, three of the four HBM accesses are
    W-wide strided row bursts; the blocked (B, C2, L1, W1) intermediate
    makes pass 1's write and pass 2's read contiguous full-slab DMAs,
    leaving only the two unavoidable strided sides. ON by default:
    blocked led row-major in both on-device measurement campaigns
    (session_r2s3: 3.10 vs 3.40 ms at 16×1M; confirm round 0 with the
    folded scale: 2.65 vs 2.75 ms)."""
    import os

    return os.environ.get("FFTLAB_FS_BLOCKED", "1") != "0"


def _blocked_filter_default() -> bool:
    """Sandwich (filter) blocked-layout default: ON.

    Measured r2 on-device (bench_artifacts/session_r2s3.jsonl): the
    blocked sandwich runs the 16x1M filter in 2.53 ms vs 6.25 ms
    row-major — the forward's out_blocked chunks feed the inverse's
    in_blocked pass 1 as contiguous slabs, so only the first read and
    last write of the whole four-pass sandwich stay strided.
    FFTLAB_FS_BLOCKED (set to anything) still overrides both ways."""
    import os

    env = os.environ.get("FFTLAB_FS_BLOCKED")
    if env is not None:
        return env != "0"
    return True


def _two_pass(xr, xi, direction: Direction, interpret: bool, h2=None,
              width=None, blocked_mid: bool | None = None,
              sides=None, in_blocked: bool = False,
              out_blocked: bool = False, scale: float | None = None,
              env_width: int | None = None, lanes: bool = False):
    """The two pallas launches of one transform. `h2` (pair of (1, L2, L1)
    natural-order response planes) fuses a spectral multiply into pass 2's
    epilogue for zero extra passes. Returns (B, n) unscaled.

    Layout options (all orthogonal, numerics unchanged):
      blocked_mid   store the inter-pass array as (B, C2, L1, W1) slabs
      in_blocked    xr/xi arrive as a (B, C, L1, W) blocked column array
                    (a previous launch's out_blocked result); pass 1
                    reads whole slabs instead of strided columns
      out_blocked   return (B, G1, L2, R2) blocked output instead of the
                    natural (B, n) — each block is a column chunk of the
                    natural (L2, L1) spectrum matrix, exactly what the
                    INVERSE transform with sides (L2, L1) wants as its
                    in_blocked input (the filter-sandwich fusion)
      sides         override the (L1, L2) factorization
    """
    if blocked_mid is None:
        blocked_mid = _blocked_mid_default()
    if in_blocked:
        B, Cin, L1, W1 = xr.shape
        L2 = Cin * W1
        n = L1 * L2
        if sides is not None and tuple(sides) != (L1, L2):
            raise ValueError(f"sides {sides} conflict with blocked input "
                             f"shape {xr.shape}")
    else:
        B, n = xr.shape
        L1, L2 = sides if sides is not None else _split_sides(n)
        if L1 * L2 != n:
            raise ValueError(f"sides {L1}x{L2} != n {n}")
        # An explicit `width` ARGUMENT that doesn't fit must fail the
        # divisibility check below (not silently measure something else
        # than the caller asked for); the env knob (`env_width`,
        # resolved outside jit) and the defaults clamp to what each
        # pass's chunked side admits.
        W1 = width or (_clamp_width(env_width, L2) if env_width
                       else min(_blk_width(L1), L2))
    R2 = width or (_clamp_width(env_width, L1) if env_width
                   else min(_blk_width(L2), L1))
    if L2 % W1 or W1 % LANES or L1 % R2 or R2 % LANES:
        raise ValueError(
            f"block widths ({W1}, {R2}) must be multiples of {LANES} "
            f"dividing the sides ({L1}, {L2})"
        )
    C2 = L2 // W1
    G1 = L1 // R2
    fa1, fb1 = _split_factors(L1)
    # lanes=True: pass 2 contracts the slab's lane-side digit axes
    # directly (transpose-free; see _pass2_lanes_kernel). The blocked
    # stack pins fb2 to W1; row-major lane-splits at 128.
    if lanes:
        fa2, fb2 = (L2 // W1, W1) if blocked_mid else (L2 // LANES, LANES)
    else:
        fa2, fb2 = _split_factors(L2)
    tabs2 = _col_fft_tables(L2, direction, scale,  # scale rides pass 2
                            factors=(fa2, fb2))
    tabs1 = _col_fft_tables(L1, direction)
    A, P = _rank1_twiddle_np(L1, L2, W1, direction)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))
    Pi = jnp.asarray(P.imag.astype(np.float32))

    # Block = [one b, all L1 sublanes, one W1-lane j2 chunk]. Mosaic
    # requires the last two BLOCK dims divisible by (8, 128) or equal to
    # the array dims — (L1, W1) on a (B, L1, L2) array satisfies both.
    if in_blocked:
        x3r, x3i = xr, xi
        p1_in_blk = pl.BlockSpec((1, 1, L1, W1), lambda c, b: (b, c, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        x3r = xr.reshape(B, L1, L2)
        x3i = xi.reshape(B, L1, L2)
        p1_in_blk = pl.BlockSpec((1, L1, W1), lambda c, b: (b, 0, c),
                                 memory_space=pltpu.VMEM)
    # A: per-block (L1, 1) twiddle column (last block dim 1 == array dim)
    a_blk = pl.BlockSpec((1, L1, 1), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    if blocked_mid:
        p1_out_blk = pl.BlockSpec((1, 1, L1, W1), lambda c, b: (b, c, 0, 0),
                                  memory_space=pltpu.VMEM)
        p1_out_shape = jax.ShapeDtypeStruct((B, C2, L1, W1), xr.dtype)
    else:
        p1_out_blk = pl.BlockSpec((1, L1, W1), lambda c, b: (b, 0, c),
                                  memory_space=pltpu.VMEM)
        p1_out_shape = jax.ShapeDtypeStruct((B, L1, L2), xr.dtype)
    mr, mi = pl.pallas_call(
        functools.partial(_pass1_kernel, fa=fa1, fb=fb1),
        grid=(C2, B),
        in_specs=[p1_in_blk, p1_in_blk] + [const] * 6
                 + [a_blk, a_blk, const, const],
        out_specs=(p1_out_blk, p1_out_blk),
        out_shape=(p1_out_shape, p1_out_shape),
        cost_estimate=pl.CostEstimate(
            flops=8 * (fa1 + fb1) * L1 * W1 * B * C2,
            transcendentals=0,
            bytes_accessed=4 * 4 * n * B,
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1, Ar, Ai, Pr, Pi)

    # pass 2: rows of the (L1, L2) matrix -> final (B, L2, L1)
    if blocked_mid:
        # one R2-row slab of every lane block: contiguous (R2*W1)-sized
        # chunks, C2 of them per program
        row_blk = pl.BlockSpec((1, C2, R2, W1), lambda g, b: (b, 0, g, 0),
                               memory_space=pltpu.VMEM)
    else:
        row_blk = pl.BlockSpec((1, R2, L2), lambda g, b: (b, g, 0),
                               memory_space=pltpu.VMEM)
    if out_blocked:
        out_blk = pl.BlockSpec((1, 1, L2, R2), lambda g, b: (b, g, 0, 0),
                               memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, G1, L2, R2), xr.dtype)
    else:
        out_blk = pl.BlockSpec((1, L2, R2), lambda g, b: (b, 0, g),
                               memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, L2, L1), xr.dtype)
    h_blk = pl.BlockSpec((1, L2, R2), lambda g, b: (0, 0, g),
                         memory_space=pltpu.VMEM)
    if h2 is None:
        body = _pass2_lanes_kernel if lanes else _pass2_kernel
        kern = functools.partial(body, fa=fa2, fb=fb2)
        in_specs = [row_blk, row_blk] + [const] * 6
        args = (mr, mi, *tabs2)
    else:
        body = _pass2_filter_lanes_kernel if lanes else _pass2_filter_kernel
        kern = functools.partial(body, fa=fa2, fb=fb2)
        in_specs = [row_blk, row_blk] + [const] * 6 + [h_blk, h_blk]
        args = (mr, mi, *tabs2, h2[0], h2[1])
    yr, yi = pl.pallas_call(
        kern,
        grid=(G1, B),
        in_specs=in_specs,
        out_specs=(out_blk, out_blk),
        out_shape=(out_shape, out_shape),
        cost_estimate=pl.CostEstimate(
            flops=8 * (fa2 + fb2) * L2 * R2 * B * G1,
            transcendentals=0,
            bytes_accessed=4 * 4 * n * B,
        ),
        interpret=interpret,
    )(*args)
    if out_blocked:
        return yr, yi  # (B, G1, L2, R2) blocked column chunks
    # (B, L2, L1) flattens to [b, k2, k1] = natural spectrum order.
    return yr.reshape(B, n), yi.reshape(B, n)


@functools.partial(
    jax.jit,
    static_argnames=("direction", "interpret", "width", "blocked", "scale",
                     "env_width", "lanes"),
)
def _fft_large_impl(xr, xi, *, direction: Direction, interpret: bool,
                    width=None, blocked=None, scale=None,
                    env_width: int | None = None, lanes: bool = False):
    n = int(xr.shape[-1])
    eff = (1.0 / n if direction == Direction.INVERSE else 1.0)
    eff *= (scale if scale is not None else 1.0)
    return _two_pass(xr, xi, direction, interpret, width=width,
                     blocked_mid=blocked,
                     scale=None if eff == 1.0 else eff,
                     env_width=env_width, lanes=lanes)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "blocked", "env_width",
                                    "lanes"))
def _filter_large_impl(xr, xi, h2r, h2i, *, interpret: bool,
                       blocked: bool = False,
                       env_width: int | None = None,
                       lanes: bool = False):
    """FFT -> H -> IFFT in four launches. With `blocked` (sandwich
    fusion) the forward's pass 2 writes its natural (L2, L1) spectrum
    matrix in COLUMN BLOCKS — exactly the inverse transform's (with
    sides swapped to (L2, L1)) pass-1 input — so the two inner HBM
    accesses are contiguous slabs; with blocked_mid on top only the
    first read and last write of the whole sandwich stay strided."""
    n = int(xr.shape[-1])
    gr, gi = _two_pass(xr, xi, Direction.FORWARD, interpret,
                       h2=(h2r, h2i), blocked_mid=blocked,
                       out_blocked=blocked, env_width=env_width,
                       lanes=lanes)
    # inverse 1/n rides the last pass's tables: four passes, no more
    return _two_pass(gr, gi, Direction.INVERSE, interpret,
                     blocked_mid=blocked, in_blocked=blocked,
                     scale=1.0 / n, env_width=env_width, lanes=lanes)


def _lanes_default() -> bool:
    """FFTLAB_FS_LANES=1 turns on the transpose-free pass 2 (lane
    contraction) in the two-pass PLAIN-FFT kernel; off by default —
    the r4 paired A/B gave the plain-FFT lane variant no consistent
    edge (resolved OUTSIDE jit — static cache key)."""
    import os

    return os.environ.get("FFTLAB_FS_LANES", "0") != "0"


def _filter_lanes_default() -> bool:
    """The SANDWICH defaults to the lane-contraction pass 2: the r4
    paired A/B reproduced a ~4% win across two independent campaigns
    (fsfilt_lanes/fsfilt_blocked median ratio 0.962 then 0.959 at
    n=32/24 adjacent pairs, bench_artifacts/paired_ab.jsonl) — the
    two-campaign rule the r3 flip policy requires. FFTLAB_FSFILT_LANES=0
    opts back out; FFTLAB_FS_LANES=1 still forces lanes everywhere."""
    import os

    if os.environ.get("FFTLAB_FS_LANES", "0") != "0":
        return True
    return os.environ.get("FFTLAB_FSFILT_LANES", "1") != "0"


def spectral_filter_large(xr, xi, hr, hi, interpret: bool | None = None,
                          blocked: bool | None = None,
                          lanes: bool | None = None):
    """FFT -> H -> IFFT on large signals in FOUR HBM passes total: the
    H multiply rides pass 2's epilogue (zero extra traffic), and the
    inverse is the same two-pass kernel with conjugated tables. The XLA
    einsum sandwich costs ~12 passes at these sizes.

    xr, xi: [..., n] split planes (n = 2^15..2^21 pow2).
    hr, hi: the length-n frequency response H[k], natural bin order.
    Equivalent numerics: ifft(fft(x) * H) with 1/n scaling
    (SURVEY.md §3.4 sandwich; fft_filtering.c:111-132 semantics)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_large(n):
        raise ValueError(
            f"spectral_filter_large supports pow2 n in [{MIN_N}, {MAX_N}]; got {n}"
        )
    L1, L2 = _split_sides(n)
    h2r = jnp.asarray(hr, dtype=xr.dtype).reshape(1, L2, L1)
    h2i = jnp.asarray(hi, dtype=xr.dtype).reshape(1, L2, L1)
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    if blocked is None:
        blocked = _blocked_filter_default()  # resolved outside jit (cache key)
    if lanes is None:
        lanes = _filter_lanes_default()
    yr, yi = _filter_large_impl(
        xr.reshape(B, n), xi.reshape(B, n), h2r, h2i,
        interpret=bool(interpret), blocked=bool(blocked),
        env_width=_env_width(), lanes=bool(lanes),
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


def fft_split_large(xr, xi, direction=FORWARD,
                    interpret: bool | None = None, width: int | None = None,
                    blocked: bool | None = None,
                    scale: float | None = None,
                    lanes: bool | None = None):
    """Batched large-n FFT on split planes via the two-pass VMEM kernel.

    xr, xi: float32 [B, n] (or [..., n]; batch dims are flattened),
    n = 2^15..2^21 pow2 (see MAX_N note). Forward unscaled / inverse 1/n (reference
    convention, radix2_dit.c:115-119). Natural-order output.
    `blocked` picks the intermediate layout (None = FFTLAB_FS_BLOCKED env,
    see _blocked_mid_default). `scale` folds an extra output
    normalization into the pass-2 tables for free (it composes with the
    inverse 1/n) — a separate multiply would cost a whole HBM pass.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if blocked is None:
        # Resolve the env default OUTSIDE jit: `blocked` is a static jit
        # arg, so deferring to trace time would let a stale cache entry
        # (keyed on blocked=None) silently ignore later env changes.
        blocked = _blocked_mid_default()
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_large(n):
        raise ValueError(
            f"fft_split_large supports pow2 n in [{MIN_N}, {MAX_N}]; got {n}"
        )
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    if lanes is None:
        lanes = _lanes_default()
    yr, yi = _fft_large_impl(
        xr.reshape(B, n), xi.reshape(B, n),
        direction=Direction(int(direction)), interpret=bool(interpret),
        width=width, blocked=bool(blocked),
        scale=None if scale is None else float(scale),
        env_width=_env_width(), lanes=bool(lanes),
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


def _half_cfft(name: str, n: int, direction, interpret: bool | None):
    """The half-size complex transform for the pack-two-reals r2c/c2r
    wrappers: the two-pass kernel when n/2 fits it, else the three-pass
    kernel, else a ValueError naming both constraints (even n, pow2
    half in [2^15, 2^26])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n % 2:
        raise ValueError(f"{name} needs even n; got {n}")
    half = n // 2
    if supported_large(half):
        return lambda a, b: fft_split_large(a, b, direction,
                                            interpret=interpret)
    from fftlab.kernels.threestep_vmem import fft_split_huge, supported_huge

    if not supported_huge(half):
        raise ValueError(
            f"{name} needs n/2 to be a power of two in [{MIN_N}, 2^26]; "
            f"got n={n} (n/2={half})"
        )
    return lambda a, b: fft_split_huge(a, b, direction, interpret=interpret)


def rfft_split_large(x, interpret: bool | None = None):
    """Real-input FFT for huge signals: real [..., n] -> one-sided
    (re, im) pair of n//2+1 bins, running the half-size complex
    transform on the two-/three-pass kernel (pack-two-reals,
    real_fft.py semantics). n/2 must be a pow2 in [2^15, 2^26],
    i.e. n = 2^16..2^27."""
    from fftlab.algos.split_stockham import rfft_split

    x = jnp.asarray(x)
    n = int(x.shape[-1])
    cfft = _half_cfft("rfft_split_large", n, FORWARD, interpret)
    return rfft_split(x, cfft=cfft)


def irfft_split_large(Xr, Xi, n: int | None = None,
                      interpret: bool | None = None):
    """Real-output inverse FFT for huge spectra: one-sided (re, im) of
    n//2+1 bins -> real [..., n], running the half-size INVERSE complex
    transform on the two-/three-pass kernel (the c2r the reference
    declares and returns NULL for, fft_auto.c:405-408). n/2 must be a
    pow2 in [2^15, 2^26]; inverse of `rfft_split_large` (1/n scaled)."""
    from fftlab.algos.split_stockham import irfft_split

    Xr = jnp.asarray(Xr)
    if n is None:
        n = 2 * (int(Xr.shape[-1]) - 1)
    cfft = _half_cfft("irfft_split_large", n, Direction.INVERSE, interpret)
    return irfft_split(Xr, Xi, n=n, cfft=cfft)


# ---------------------------------------------------------------------------
# Differentiability: custom VJP (Pallas kernels are not traced by AD).
# The DFT is linear; the adjoint of the unscaled forward is the unscaled
# opposite-direction transform (same pattern as kernels/fft_vmem.py).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fft_split_large_ad(xr, xi, direction=FORWARD,
                       interpret: bool | None = None):
    """`fft_split_large` with a custom VJP (differentiable)."""
    return fft_split_large(xr, xi, direction, interpret)


from fftlab.kernels._ad import make_vjp_rules

_large_ad_fwd, _large_ad_bwd = make_vjp_rules(fft_split_large)


fft_split_large_ad.defvjp(_large_ad_fwd, _large_ad_bwd)
