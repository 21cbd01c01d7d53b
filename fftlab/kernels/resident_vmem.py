"""One-HBM-residency FFT for mid/large n (2^15..2^20): read the whole
signal into VMEM once, run BOTH four-step passes on the VMEM-resident
matrix, write the natural-order spectrum once.

The two-pass kernel (kernels/fourstep_vmem.py) is floor-limited at
32 B/sample: each pass reads and writes HBM. But a 1M-point split-f32
signal is only 8 MB — it FITS in VMEM next to chunk workspaces. This
kernel exploits that:

  per grid program (one batch row b):
    1. ONE contiguous DMA x[b] (L1, L2) HBM -> VMEM M   (8 B/sample in)
    2. phase A, in place on M: for each 128-lane column chunk c,
       length-L1 column FFT (two MXU contractions, natural order) +
       the rank-1-factored four-step twiddle W_n^{k1*j2}
    3. phase B: for each R-row chunk g, transpose M[g] in VMEM,
       length-L2 column FFT, async-DMA the (L2, R) natural-spectrum
       column chunk to out[b, :, g] (double-buffered staging so the
       strided write overlaps the next chunk's compute)
                                                        (8 B/sample out)

Traffic: 16 B/sample — HALF the two-pass kernel's floor — and the read
side is a single full-bandwidth contiguous burst instead of strided
column slabs. Only the output write stays strided (natural order is the
API contract; a k2-row of the spectrum needs every k1 chunk).

The in-VMEM column FFT and all tables are shared with the two-pass
kernel (fourstep_vmem._col_fft_vmem): same math, same natural-order
digit-reversal-free property, same f64-precomputed constants.

Reference anchors: the four-step structure parallel_fft.c:213-272; the
single-residency ambition this realizes is the custom-kernel TODO at
fft_cuda.cu:264-266 (cuFFT's large-n plans are multi-pass; this isn't).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.types import Direction, FORWARD, is_power_of_two, log2_int
from fftlab.kernels.fourstep_vmem import (
    LANES,
    _col_fft_tables,
    _col_fft_vmem,
    _rank1_twiddle_np,
    _split_factors,
    _split_sides,
)

MIN_N = 1 << 15
# M (both planes) + staging + tables must fit 16 MB VMEM: at 2^20 the
# resident matrix is 8 MB, staging 2x(L2*R*4)x2 = 2 MB (R=128), chunk
# temporaries ~3 MB peak -> ~14 MB. 2^21 would need a 16 MB matrix.
MAX_N = 1 << 20


def supported_resident(n: int) -> bool:
    return is_power_of_two(n) and MIN_N <= n <= MAX_N


def _out_chunk_rows(L1: int) -> int:
    """Output-chunk width R (k1 values per phase-B chunk). Wider R means
    wider strided-write bursts (R*4 B at stride L1*4 B) but a bigger
    staging footprint (2 buffers x L2*R*4 x 2 planes). Env knob
    FFTLAB_RES_R for device tuning."""
    import os

    forced = os.environ.get("FFTLAB_RES_R")
    if forced:
        r = int(forced)
        if r % LANES or L1 % r:
            raise ValueError(
                f"FFTLAB_RES_R={r} must be a multiple of {LANES} dividing L1={L1}"
            )
        return r
    return min(LANES, L1)


def _resident_kernel(xr_hbm, xi_hbm,
                     Far1, Fai1, Fbr1, Fbi1, twr1, twi1,
                     Far2, Fai2, Fbr2, Fbi2, twr2, twi2,
                     Ar, Ai, Pr, Pi,
                     or_hbm, oi_hbm,
                     *refs,
                     L1: int, L2: int, W: int, R: int,
                     fa1: int, fb1: int, fa2: int, fb2: int,
                     nbuf: int):
    if nbuf == 2:
        Mr, Mi, s0r, s0i, s1r, s1i, in_sems, out_sems = refs
        stages = ((s0r, s0i), (s1r, s1i))
    else:
        # squeeze mode (M at half of VMEM): one staging pair — the
        # write DMA serializes against the next chunk's compute, but
        # the resident matrix fits
        Mr, Mi, s0r, s0i, in_sems, out_sems = refs
        stages = ((s0r, s0i),)
    b = pl.program_id(0)
    C2 = L2 // W
    G1 = L1 // R

    # --- load: one contiguous burst per plane -------------------------
    dr = pltpu.make_async_copy(xr_hbm.at[b], Mr, in_sems.at[0])
    di = pltpu.make_async_copy(xi_hbm.at[b], Mi, in_sems.at[1])
    dr.start()
    di.start()
    dr.wait()
    di.wait()

    tabs1 = (Far1[...], Fai1[...], Fbr1[...], Fbi1[...],
             twr1[...], twi1[...])
    tabs2 = (Far2[...], Fai2[...], Fbr2[...], Fbi2[...],
             twr2[...], twi2[...])
    pr = Pr[...]   # (L1, W)
    pi = Pi[...]

    # --- phase A: length-L1 column FFT + four-step twiddle, in place --
    for c in range(C2):
        sl = slice(c * W, (c + 1) * W)
        yr, yi = _col_fft_vmem(Mr[:, sl], Mi[:, sl], tabs1, fa1, fb1)
        ar = Ar[c]         # (L1, 1) rank-1 twiddle column
        ai = Ai[c]
        wr = ar * pr - ai * pi
        wi = ar * pi + ai * pr
        Mr[:, sl] = yr * wr - yi * wi
        Mi[:, sl] = yr * wi + yi * wr

    # --- phase B: length-L2 FFT per R-row chunk, overlapped writes ----
    # The g-loop is a STATIC Python unroll, so the DMA descriptors are
    # plain Python objects: stash each slot's in-flight pair and .wait()
    # it before the staging buffer is reused (double buffering).
    pending = [None] * len(stages)
    for g in range(G1):
        slot = g % len(stages)
        br_s, bi_s = stages[slot]
        if pending[slot] is not None:
            pending[slot][0].wait()
            pending[slot][1].wait()
        rs = slice(g * R, (g + 1) * R)
        xr = jnp.transpose(Mr[rs, :], (1, 0))   # (L2, R)
        xi = jnp.transpose(Mi[rs, :], (1, 0))
        yr, yi = _col_fft_vmem(xr, xi, tabs2, fa2, fb2)
        br_s[...] = yr
        bi_s[...] = yi
        dr_o = pltpu.make_async_copy(
            br_s, or_hbm.at[b, :, pl.ds(g * R, R)], out_sems.at[2 * slot]
        )
        di_o = pltpu.make_async_copy(
            bi_s, oi_hbm.at[b, :, pl.ds(g * R, R)], out_sems.at[2 * slot + 1]
        )
        dr_o.start()
        di_o.start()
        pending[slot] = (dr_o, di_o)
    # drain the tail DMAs before the next program reuses the staging
    for pair in pending:
        if pair is not None:
            pair[0].wait()
            pair[1].wait()


@functools.partial(
    jax.jit,
    static_argnames=("direction", "interpret", "scale", "R"),
)
def _fft_resident_impl(xr, xi, *, direction: Direction, interpret: bool,
                       scale=None, R: int | None = None):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    if R is None:
        R = min(LANES, L1)
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)
    eff = (1.0 / n if direction == Direction.INVERSE else 1.0)
    eff *= (scale if scale is not None else 1.0)
    tabs1 = _col_fft_tables(L1, direction)
    tabs2 = _col_fft_tables(L2, direction, None if eff == 1.0 else eff)
    A, P = _rank1_twiddle_np(L1, L2, W, direction)
    Ar = jnp.asarray(A.real.astype(np.float32))   # (C2, L1, 1)
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))   # (L1, W)
    Pi = jnp.asarray(P.imag.astype(np.float32))

    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = xr.dtype
    # Squeeze mode when the resident matrix takes half of VMEM (2^20:
    # 8 MB both planes): one staging pair instead of two and an explicit
    # VMEM budget so the conservative default limit doesn't reject it.
    nbuf = 1 if n >= (1 << 20) else 2
    staging = [pltpu.VMEM((L2, R), dt) for _ in range(2 * nbuf)]
    yr, yi = pl.pallas_call(
        functools.partial(_resident_kernel, L1=L1, L2=L2, W=W, R=R,
                          fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2, nbuf=nbuf),
        grid=(B,),
        in_specs=[hbm, hbm] + [const] * 16,
        out_specs=(hbm, hbm),
        out_shape=(jax.ShapeDtypeStruct((B, L2, L1), dt),
                   jax.ShapeDtypeStruct((B, L2, L1), dt)),
        scratch_shapes=[
            pltpu.VMEM((L1, L2), dt),      # Mr
            pltpu.VMEM((L1, L2), dt),      # Mi
            *staging,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2 * nbuf,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=2 * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1, *tabs2, Ar, Ai, Pr, Pi)
    # (B, L2, L1) flattens to [b, k2*L1 + k1] = natural order
    return yr.reshape(B, n), yi.reshape(B, n)


def fft_split_resident(xr, xi, direction=FORWARD,
                       interpret: bool | None = None,
                       scale: float | None = None):
    """Batched FFT on split planes via the one-residency VMEM kernel.

    xr, xi: float32 [..., n], n = 2^15..2^20 pow2. Forward unscaled /
    inverse 1/n (reference convention, radix2_dit.c:115-119);
    natural-order output. `scale` folds an extra output normalization
    into the phase-B tables for free."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_resident(n):
        raise ValueError(
            f"fft_split_resident supports pow2 n in [{MIN_N}, {MAX_N}]; got {n}"
        )
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    L1, _ = _split_sides(n)
    yr, yi = _fft_resident_impl(
        xr.reshape(B, n), xi.reshape(B, n),
        direction=Direction(int(direction)), interpret=bool(interpret),
        scale=None if scale is None else float(scale),
        # Resolved OUTSIDE jit (static cache key): a stale entry keyed
        # on the default must not shadow a later FFTLAB_RES_R change.
        R=_out_chunk_rows(L1),
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


# ---------------------------------------------------------------------------
# Fused single-residency spectral filter: FFT -> H -> IFFT in ONE kernel,
# 16 B/sample for the WHOLE sandwich (the blocked two-pass sandwich costs
# 64 B/sample; the XLA einsum pipeline ~12 passes).
#
# Why it fuses: the forward's phase-B output chunks are (L2, R) column
# chunks of the natural spectrum matrix Y (L2, L1) — exactly the column
# chunks the INVERSE four-step (sides swapped to (L2, L1)) consumes in
# its phase A. So each mid-loop iteration g does
#     fwd phase B -> ⊙H chunk -> inv phase A (+ inverse rank-1 twiddle)
# without the spectrum ever leaving VMEM. The inverse intermediate M'
# (L2, L1) is stored TRANSPOSED into the resident matrix's rows as they
# are freed (chunk g reads M rows [gR, (g+1)R) for the forward and
# writes the same rows at iteration end), which makes the inverse's
# phase B a plain column slice — no transpose at all.
#
# Reference anchor: the FFT -> H[k] -> IFFT hot pipeline of
# fft_filtering.c:111-132 + the overlap-save description convolution.c:
# 284-290, as one VMEM residency.
# ---------------------------------------------------------------------------


def _resident_filter_kernel(xr_hbm, xi_hbm,
                            F1r, F1i, G1r, G1i, T1r, T1i,      # fwd L1
                            F2r, F2i, G2r, G2i, T2r, T2i,      # fwd L2
                            Afr, Afi, Pfr, Pfi,                # fwd rank-1
                            I2ar, I2ai, I2br, I2bi, I2tr, I2ti,  # inv L2
                            Iar, Iai, Ipr, Ipi,                # inv rank-1
                            I1ar, I1ai, I1br, I1bi, I1tr, I1ti,  # inv L1 (scaled)
                            Hr, Hi,
                            or_hbm, oi_hbm,
                            *refs,
                            L1: int, L2: int, W: int, R: int, S: int,
                            fa1: int, fb1: int, fa2: int, fb2: int,
                            h_stream: bool):
    b = pl.program_id(0)
    C2 = L2 // W
    G = L1 // R
    Q = L2 // S
    if h_stream:
        (Mr, Mi, s0r, s0i, s1r, s1i, h0r, h0i, h1r, h1i,
         in_sems, out_sems, h_sems) = refs
        hbufs = ((h0r, h0i), (h1r, h1i))
    else:
        Mr, Mi, s0r, s0i, s1r, s1i, in_sems, out_sems = refs

    dr = pltpu.make_async_copy(xr_hbm.at[b], Mr, in_sems.at[0])
    di = pltpu.make_async_copy(xi_hbm.at[b], Mi, in_sems.at[1])
    dr.start()
    di.start()
    if h_stream:
        # prefetch H chunk 0 while the signal loads
        h_pend = []
        hr0 = pltpu.make_async_copy(Hr.at[:, pl.ds(0, R)], h0r, h_sems.at[0])
        hi0 = pltpu.make_async_copy(Hi.at[:, pl.ds(0, R)], h0i, h_sems.at[1])
        hr0.start()
        hi0.start()
        h_pend = [(hr0, hi0), None]
    dr.wait()
    di.wait()

    tabs1f = (F1r[...], F1i[...], G1r[...], G1i[...], T1r[...], T1i[...])
    tabs2f = (F2r[...], F2i[...], G2r[...], G2i[...], T2r[...], T2i[...])
    tabs2i = (I2ar[...], I2ai[...], I2br[...], I2bi[...],
              I2tr[...], I2ti[...])
    tabs1i = (I1ar[...], I1ai[...], I1br[...], I1bi[...],
              I1tr[...], I1ti[...])
    pfr = Pfr[...]
    pfi = Pfi[...]
    ipr = Ipr[...]
    ipi = Ipi[...]

    # --- forward phase A: in place on M -------------------------------
    for c in range(C2):
        sl = slice(c * W, (c + 1) * W)
        yr, yi = _col_fft_vmem(Mr[:, sl], Mi[:, sl], tabs1f, fa1, fb1)
        ar = Afr[c]
        ai = Afi[c]
        wr = ar * pfr - ai * pfi
        wi = ar * pfi + ai * pfr
        Mr[:, sl] = yr * wr - yi * wi
        Mi[:, sl] = yr * wi + yi * wr

    # --- mid loop: fwd phase B -> ⊙H -> inv phase A, rows recycled ----
    fa2i, fb2i = fa2, fb2   # inverse uses the same factor split
    for g in range(G):
        rs = slice(g * R, (g + 1) * R)
        tr_ = jnp.transpose(Mr[rs, :], (1, 0))   # (L2, R)
        ti_ = jnp.transpose(Mi[rs, :], (1, 0))
        yr, yi = _col_fft_vmem(tr_, ti_, tabs2f, fa2, fb2)
        if h_stream:
            slot = g % 2
            h_pend[slot][0].wait()
            h_pend[slot][1].wait()
            hr = hbufs[slot][0][...]
            hi = hbufs[slot][1][...]
        else:
            hr = Hr[:, rs]
            hi = Hi[:, rs]
        zr = yr * hr - yi * hi
        zi = yr * hi + yi * hr
        if h_stream and g + 1 < G:
            nslot = (g + 1) % 2
            hrn = pltpu.make_async_copy(
                Hr.at[:, pl.ds((g + 1) * R, R)], hbufs[nslot][0],
                h_sems.at[2 * nslot])
            hin = pltpu.make_async_copy(
                Hi.at[:, pl.ds((g + 1) * R, R)], hbufs[nslot][1],
                h_sems.at[2 * nslot + 1])
            hrn.start()
            hin.start()
            h_pend[nslot] = (hrn, hin)
        # inverse phase A on the spectrum chunk (sides (L2, L1))
        mr2, mi2 = _col_fft_vmem(zr, zi, tabs2i, fa2i, fb2i)
        iar = Iar[g]            # (L2, 1) inverse rank-1 column
        iai = Iai[g]
        iwr = iar * ipr - iai * ipi
        iwi = iar * ipi + iai * ipr
        vr = mr2 * iwr - mi2 * iwi   # (L2, R) = M'[:, g chunk]
        vi = mr2 * iwi + mi2 * iwr
        # store TRANSPOSED into the rows just freed: Mbuf = M'^T
        Mr[rs, :] = jnp.transpose(vr, (1, 0))
        Mi[rs, :] = jnp.transpose(vi, (1, 0))

    # --- inverse phase B: column slices of Mbuf, overlapped writes ----
    stages = ((s0r, s0i), (s1r, s1i))
    pending = [None, None]
    for q in range(Q):
        slot = q % 2
        br_s, bi_s = stages[slot]
        if pending[slot] is not None:
            pending[slot][0].wait()
            pending[slot][1].wait()
        cs = slice(q * S, (q + 1) * S)
        # Mbuf[:, q chunk] IS transpose(M'[q rows, :]) — no transpose op
        yr, yi = _col_fft_vmem(Mr[:, cs], Mi[:, cs], tabs1i, fa1, fb1)
        br_s[...] = yr
        bi_s[...] = yi
        dro = pltpu.make_async_copy(
            br_s, or_hbm.at[b, :, pl.ds(q * S, S)], out_sems.at[2 * slot])
        dio = pltpu.make_async_copy(
            bi_s, oi_hbm.at[b, :, pl.ds(q * S, S)],
            out_sems.at[2 * slot + 1])
        dro.start()
        dio.start()
        pending[slot] = (dro, dio)
    for pair in pending:
        if pair is not None:
            pair[0].wait()
            pair[1].wait()


@functools.partial(
    jax.jit, static_argnames=("interpret",),
)
def _filter_resident_impl(xr, xi, h2r, h2i, *, interpret: bool):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    R = min(LANES, L1)
    S = min(LANES, L1)   # staging is (L1, S); S must divide L2 (pow2 ok)
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)
    fwd = Direction.FORWARD
    inv = Direction.INVERSE
    tabs1f = _col_fft_tables(L1, fwd)
    tabs2f = _col_fft_tables(L2, fwd)
    tabs2i = _col_fft_tables(L2, inv)
    tabs1i = _col_fft_tables(L1, inv, 1.0 / n)   # 1/n rides the last pass
    Af, Pf = _rank1_twiddle_np(L1, L2, W, fwd)
    Ai_, Pi_ = _rank1_twiddle_np(L2, L1, R, inv)
    c32 = lambda a: jnp.asarray(np.ascontiguousarray(a).astype(np.float32))
    consts = (*tabs1f, *tabs2f,
              c32(Af.real), c32(Af.imag), c32(Pf.real), c32(Pf.imag),
              *tabs2i,
              c32(Ai_.real), c32(Ai_.imag), c32(Pi_.real), c32(Pi_.imag),
              *tabs1i)

    dt = xr.dtype
    # H (both planes) in VMEM costs 8*n bytes; from 2^20 the resident
    # matrix alone is 8 MB, so H streams from HBM chunk-by-chunk
    # (+8 B/sample of read traffic — still 2.7x below the two-launch
    # sandwich).
    h_stream = n >= (1 << 20)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    h_spec = hbm if h_stream else const
    scratch = [
        pltpu.VMEM((L1, L2), dt),
        pltpu.VMEM((L1, L2), dt),
        pltpu.VMEM((L1, S), dt),
        pltpu.VMEM((L1, S), dt),
        pltpu.VMEM((L1, S), dt),
        pltpu.VMEM((L1, S), dt),
    ]
    if h_stream:
        scratch += [pltpu.VMEM((L2, R), dt) for _ in range(4)]
    scratch += [pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((4,))]
    if h_stream:
        scratch += [pltpu.SemaphoreType.DMA((4,))]
    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    yr, yi = pl.pallas_call(
        functools.partial(_resident_filter_kernel, L1=L1, L2=L2, W=W,
                          R=R, S=S, fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2,
                          h_stream=h_stream),
        grid=(B,),
        in_specs=[hbm, hbm] + [const] * 32 + [h_spec, h_spec],
        out_specs=(hbm, hbm),
        out_shape=(jax.ShapeDtypeStruct((B, L1, L2), dt),
                   jax.ShapeDtypeStruct((B, L1, L2), dt)),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=16 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=2 * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3r, x3i, *consts, h2r, h2i)
    # (B, L1, L2) flattens to [b, j1*L2 + j2] = natural time order
    return yr.reshape(B, n), yi.reshape(B, n)


def spectral_filter_resident(xr, xi, hr, hi,
                             interpret: bool | None = None):
    """ifft(fft(x) * H) on split planes in ONE kernel and ONE HBM
    residency (n = 2^15..2^19; at 2^20 H streams chunk-wise from HBM).
    hr, hi: length-n frequency response, natural bin order. Matches
    fourstep_vmem.spectral_filter_large numerics (1/n inverse scaling;
    fft_filtering.c:111-132 semantics)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_resident(n):
        raise ValueError(
            f"spectral_filter_resident supports pow2 n in "
            f"[{MIN_N}, {MAX_N}]; got {n}"
        )
    L1, L2 = _split_sides(n)
    # response as the natural spectrum matrix (L2, L1), column chunks
    h2r = jnp.asarray(hr, dtype=xr.dtype).reshape(L2, L1)
    h2i = jnp.asarray(hi, dtype=xr.dtype).reshape(L2, L1)
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    yr, yi = _filter_resident_impl(
        xr.reshape(B, n), xi.reshape(B, n), h2r, h2i,
        interpret=bool(interpret),
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)
