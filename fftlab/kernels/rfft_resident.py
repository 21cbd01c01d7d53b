"""One-HBM-residency r2c: pack + half-size FFT + Hermitian unpack in a
SINGLE Pallas kernel (read the real signal once, write the one-sided
spectrum once).

The split r2c pipeline (algos/split_stockham.rfft_split) runs THREE
device programs — pack kernel, resident c2c, unpack kernel — plus an
XLA concatenate for the Nyquist bin; each stage is a full HBM
round-trip, so a 2^21-point r2c pays ~5 residencies for work whose
inner transform is one (r4 bench: 15.67 ms vs the 1.61 ms half-size
c2c). This kernel extends the resident v4 formulation
(kernels/resident_vmem._resident_v4_kernel) with a fused prologue and
epilogue so the WHOLE r2c is one residency:

  phase A (s < C2): the in block delivers the raw real signal viewed
      (B, L1, 2W); the even/odd deinterleave is two (2W -> W)
      selection MATMULS (0/1 matrices are exact at HIGHEST precision,
      same trick as kernels/rfft_vmem), giving the packed complex
      chunk z = x[0::2] + i*x[1::2] in registers; then the standard
      v4 phase A (column FFT over j1, rank-1 twiddle,
      transpose-store into the (G1, L2, R) scratch).
  phase B (C2 <= s < C2+G1): pure column FFT over j2 — the result Z
      (the half-size spectrum, natural order) is stored BACK INTO the
      scratch slot it was read from; nothing touches HBM.
  phase C (s >= C2+G1, c = s-C2-G1): Hermitian unpack entirely from
      VMEM. X[k] = E_k + W_n^k * O_k needs Z[k] and conj(Z[(m-k)%m]);
      for the natural block c (k1 in [cR, (c+1)R)) the mirror values
      live in scratch slots G1-1-c (lanes r>=1: row-mirror k2 ->
      L2-1-k2 via a sublane flip, lane-mirror r -> R-r via a shifted
      (R, R) exchange matmul) and (G1-c)%G1 (the r=0 straggler
      column; for c=0 its rows need the rotation (L2-k2)%L2 =
      sublane flip + roll). The unpack twiddle W_n^{k2*L1+k1} is
      RANK-1 (A2[k2] * P2[k1]) so it is built in-kernel from a
      (L2, 1) column and a BlockSpec-delivered (1, R) row slice —
      no (L2, L1) table in VMEM.

The Nyquist bin (X[m] = Re(Z[0]) - Im(Z[0])) rides an 8-row tail pad:
the output is (B, L2+8, L1) whose row-major flattening puts bin k at
flat index k for k <= m (bin m = element [L2, 0]); the caller returns
x.reshape(B, -1)[:, :m+1], a pure slice every consumer fuses — the
XLA concatenate that cost the old path a whole extra residency is
gone.

Reference anchors: the r2c plan the reference declared but never
shipped (fft_auto.c:391-403 use-after-free); the half-spectrum
symmetry optimized_dft.c:80-103; four-step structure
parallel_fft.c:213-272.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.types import FORWARD
from fftlab.kernels.fourstep_vmem import (
    LANES,
    _col_fft_tables,
    _col_fft_vmem,
    _rank1_twiddle_np,
    _split_factors,
    _split_sides,
)
from fftlab.kernels.resident_vmem import supported_resident

_P = jax.lax.Precision.HIGHEST

_PAD_ROWS = 8  # sublane-aligned tail that carries the Nyquist bin


def supported_rfft_resident(n: int) -> bool:
    """Real length n must halve into the resident c2c window and the
    deinterleave needs whole 2W-lane input blocks (L2 % W == 0 holds
    for every supported size by construction)."""
    return n % 2 == 0 and supported_resident(n // 2)


@functools.lru_cache(maxsize=None)
def _pack_sel(w: int):
    """(2w, w) 0/1 selectors: Se picks even lanes, So odd."""
    Se = np.zeros((2 * w, w), np.float32)
    So = np.zeros((2 * w, w), np.float32)
    for j in range(w):
        Se[2 * j, j] = 1.0
        So[2 * j + 1, j] = 1.0
    return Se, So


@functools.lru_cache(maxsize=None)
def _lane_mirror(r: int):
    """(r, r) exchange: lane l (>=1) -> r - l; column 0 stays zero (the
    straggler lane is assembled separately)."""
    E1 = np.zeros((r, r), np.float32)
    for l in range(1, r):
        E1[r - l, l] = 1.0
    return E1


def _dot(a, b):
    return jnp.dot(a, b, precision=_P, preferred_element_type=jnp.float32)


_TILE = 128  # sublane-flip tile (rows per anti-identity matmul)


def _flip_sublanes(x):
    """Row reversal of a 2D VMEM block WITHOUT lax.rev (Mosaic's TC
    lowering has no `rev` primitive — the r5 compile gate failed on
    jnp.flip): per-128-row anti-identity matmuls at HIGHEST precision
    (0/1 matrices are exact — v*1.0 survives the bf16 passes
    unchanged), tiles reassembled in reversed STATIC order. The
    anti-identity is built IN-KERNEL from iota (a pallas kernel cannot
    capture trace-time constants). Cost is ~33 MFLOP per (1024, 128)
    block — noise next to the FFT passes."""
    L = x.shape[0]
    t = min(_TILE, L)
    ri = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    P = jnp.where(ri + ci == t - 1, jnp.float32(1.0), jnp.float32(0.0))
    if L <= t:
        return _dot(P, x)
    T = L // t
    parts = [_dot(P, x[(T - 1 - k) * t:(T - k) * t, :]) for k in range(T)]
    return jnp.concatenate(parts, axis=0)


def _roll1_sublanes(x):
    """Roll rows down by one (out[i] = in[i-1 mod L]) via static slices
    + concat — avoids pltpu.roll in case its lowering is also partial
    on this backend."""
    return jnp.concatenate([x[-1:, :], x[:-1, :]], axis=0)


def _rfft_resident_kernel(x_blk,
                          Far1, Fai1, Fbr1, Fbi1, twr1, twi1,
                          Far2, Fai2, Fbr2, Fbi2, twr2, twi2,
                          ar_blk, ai_blk, Pr, Pi,
                          Se, So, E1, A2r, A2i, p2r_blk, p2i_blk,
                          xr_ref, xi_ref, M4r, M4i,
                          *, L1, L2, W, R, fa1, fb1, fa2, fb2,
                          half_scale):
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        x = x_blk[0]                     # (L1, 2W) raw interleaved reals
        zr = _dot(x, Se[...])            # even lanes -> re plane
        zi = _dot(x, So[...])            # odd lanes  -> im plane
        tabs1 = (Far1[...], Fai1[...], Fbr1[...], Fbi1[...],
                 twr1[...], twi1[...])
        yr, yi = _col_fft_vmem(zr, zi, tabs1, fa1, fb1)
        ar = ar_blk[0]
        ai = ai_blk[0]
        wr = ar * Pr[...] - ai * Pi[...]
        wi = ar * Pi[...] + ai * Pr[...]
        tr = yr * wr - yi * wi
        ti = yr * wi + yi * wr
        for g in range(G1):
            rs = slice(g * R, (g + 1) * R)          # static
            ls = pl.ds(s * W, W)                    # dynamic sublane
            M4r[g, ls, :] = jnp.transpose(tr[rs, :], (1, 0))
            M4i[g, ls, :] = jnp.transpose(ti[rs, :], (1, 0))

    @pl.when(jnp.logical_and(s >= C2, s < C2 + G1))
    def _phase_b():
        g = s - C2
        tabs2 = (Far2[...], Fai2[...], Fbr2[...], Fbi2[...],
                 twr2[...], twi2[...])
        yr, yi = _col_fft_vmem(M4r[g], M4i[g], tabs2, fa2, fb2)
        # In-place: slot g is read only by THIS step's column FFT and
        # phase C, which sees the spectrum Z it now holds.
        M4r[g] = yr
        M4i[g] = yi

    @pl.when(s >= C2 + G1)
    def _phase_c():
        c = s - C2 - G1
        Zlr, Zli = M4r[c], M4i[c]                   # (L2, R) natural
        # lanes r >= 1 of the conj-mirror: slot G1-1-c, rows mirrored
        # (sublane flip), lanes r -> R-r (exchange matmul; its column 0
        # is zero and gets overwritten by the straggler below).
        mr = _flip_sublanes(M4r[G1 - 1 - c])
        mi = _flip_sublanes(M4i[G1 - 1 - c])
        Zmr = _dot(mr, E1[...])
        Zmi = _dot(mi, E1[...])
        # straggler lane r = 0: slot (G1-c)%G1 column 0; rows mirror
        # L2-1-k2 for c >= 1, rotate (L2-k2)%L2 for c = 0 (the k1 = 0
        # column is its own mirror, shifted by one row).
        wrap = jnp.where(c == 0, 0, G1 - c)
        scol_r = _flip_sublanes(M4r[wrap, :, :1])
        scol_i = _flip_sublanes(M4i[wrap, :, :1])
        rot_r = _roll1_sublanes(scol_r)
        rot_i = _roll1_sublanes(scol_i)
        c0 = (c == 0)
        str_r = jnp.where(c0, rot_r, scol_r)
        str_i = jnp.where(c0, rot_i, scol_i)
        lane = jax.lax.broadcasted_iota(jnp.int32, (L2, R), 1)
        Zmr = jnp.where(lane == 0, str_r, Zmr)
        Zmi = jnp.where(lane == 0, str_i, Zmi)
        # E = h*(Zl + conj(Zm)), O = h*(Zl - conj(Zm))/i  (h folds the
        # user scale into the 0.5 factors for free)
        h = jnp.float32(half_scale)
        Er = h * (Zlr + Zmr)
        Ei = h * (Zli - Zmi)
        Or_ = h * (Zli + Zmi)
        Oi = -h * (Zlr - Zmr)
        # W_n^{k2*L1 + cR + r} = A2[k2] * P2[cR + r]: rank-1 outer
        p2r = p2r_blk[0]                            # (1, R)
        p2i = p2i_blk[0]
        Wr = A2r[...] * p2r - A2i[...] * p2i        # (L2, R)
        Wi = A2r[...] * p2i + A2i[...] * p2r
        Xr = Er + Or_ * Wr - Oi * Wi
        Xi = Ei + Or_ * Wi + Oi * Wr
        xr_ref[0, :L2, :] = Xr
        xi_ref[0, :L2, :] = Xi
        # Nyquist tail: rows [L2, L2+8) are junk except element
        # [L2, 0] of block c = 0, which carries X[m] = 2h*(Re(Z[0]) -
        # Im(Z[0])). Z[0] sits at Zl[0, 0] of block 0.
        nyq = 2.0 * h * (Zlr[0, 0] - Zli[0, 0])
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_ROWS, R), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (_PAD_ROWS, R), 1)
        hit = jnp.logical_and(jnp.logical_and(rows8 == 0, lane8 == 0), c0)
        tail = jnp.where(hit, nyq, jnp.float32(0.0))
        xr_ref[0, L2:, :] = tail
        xi_ref[0, L2:, :] = jnp.zeros((_PAD_ROWS, R), jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def _rfft_resident_impl(x, *, interpret: bool, scale=None):
    B, n = x.shape
    m = n // 2
    L1, L2 = _split_sides(m)
    W = LANES
    R = min(LANES, L1)
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)
    tabs1 = _col_fft_tables(L1, FORWARD)
    tabs2 = _col_fft_tables(L2, FORWARD)
    A, P = _rank1_twiddle_np(L1, L2, W, FORWARD)
    Ar = jnp.asarray(A.real.astype(np.float32))   # (C2, L1, 1)
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))   # (L1, W)
    Pi = jnp.asarray(P.imag.astype(np.float32))
    Se, So = _pack_sel(W)
    E1 = _lane_mirror(R)
    # unpack twiddle w^k, w = exp(-2*pi*i/n), k = k2*L1 + k1 (rank-1)
    k2 = np.arange(L2, dtype=np.float64)
    k1 = np.arange(L1, dtype=np.float64)
    a2 = np.exp(-2j * np.pi * (k2 * L1 % n) / n)
    p2 = np.exp(-2j * np.pi * k1 / n)
    A2r = jnp.asarray(a2.real.astype(np.float32)).reshape(L2, 1)
    A2i = jnp.asarray(a2.imag.astype(np.float32)).reshape(L2, 1)
    G1 = L1 // R
    p2r = jnp.asarray(p2.real.astype(np.float32)).reshape(G1, 1, R)
    p2i = jnp.asarray(p2.imag.astype(np.float32)).reshape(G1, 1, R)

    x3 = x.reshape(B, L1, 2 * L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = x.dtype
    C2 = L2 // W
    half = 0.5 * (scale if scale is not None else 1.0)
    in_blk = pl.BlockSpec(
        (1, L1, 2 * W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    p2_blk = pl.BlockSpec(
        (1, 1, R),
        lambda b, s: (jnp.maximum(s - C2 - G1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L2 + _PAD_ROWS, R),
        lambda b, s: (b, 0, jnp.maximum(s - C2 - G1, 0)),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_rfft_resident_kernel, L1=L1, L2=L2, W=W, R=R,
                          fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2,
                          half_scale=half),
        grid=(B, C2 + 2 * G1),
        in_specs=[in_blk] + [const] * 12 + [a_blk, a_blk, const, const]
                 + [const] * 5 + [p2_blk, p2_blk],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L2 + _PAD_ROWS, L1), dt),
                   jax.ShapeDtypeStruct((B, L2 + _PAD_ROWS, L1), dt)),
        scratch_shapes=[
            pltpu.VMEM((G1, L2, R), dt),   # packed/spectrum resident
            pltpu.VMEM((G1, L2, R), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (fa2 + fb2)) * m * B,
            transcendentals=0,
            bytes_accessed=3 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3, *tabs1, *tabs2, Ar, Ai, Pr, Pi,
      jnp.asarray(Se), jnp.asarray(So), jnp.asarray(E1),
      A2r, A2i, p2r, p2i)
    # Row-major (L2+8, L1) puts bin k at flat k for k <= m (the tail
    # rows beyond bin m are junk); the h-bin slice fuses into every
    # consumer — no concatenate pass.
    h = m + 1
    return (yr.reshape(B, -1)[:, :h], yi.reshape(B, -1)[:, :h])


# ---------------------------------------------------------------------------
# Inverse: fused one-residency c2r (Hermitian repack + half-size inverse
# c2c + interleave in a single kernel)
# ---------------------------------------------------------------------------


def _irfft_resident_kernel(x_blk_r, x_blk_i, m_blk_r, m_blk_i,
                           w_blk_r, w_blk_i, nyq_r,
                           Iar1, Iai1, Ibr1, Ibi1, itw1r, itw1i,
                           Iar2, Iai2, Ibr2, Ibi2, itw2r, itw2i,
                           ar_blk, ai_blk, Pr, Pi,
                           Se, So, E1w, A2r, A2i, p2r_blk, p2i_blk,
                           o_ref, M4r, M4i,
                           *, L1, L2, W, R, fa1, fb1, fa2, fb2):
    """Grid (B, C2 + G1). Phase A: Hermitian repack of the one-sided
    spectrum chunk into the half-size complex sequence Z (the mirror
    conj values assembled from the BlockSpec-delivered mirror/wrap
    chunks — sublane flip + shifted lane-exchange matmul + straggler
    column, the exact inverse of the rfft phase C), then the standard
    v4 inverse phase A (column FFT over j1 with INVERSE tables, inverse
    rank-1 twiddle, transpose-store into the (G1, L2, R) scratch).
    Phase B: column FFT over j2 (1/m + user scale folded into its
    tables), then the INTERLEAVE — out[t2, 2r] = Re z, out[t2, 2r+1] =
    Im z — as two (R -> 2R) selection matmuls straight into the real
    out block. One residency of spectrum in (the mirror views re-read
    it, +2 streamed passes) and real signal out; no concatenate, no
    separate interleave program."""
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        Xlr, Xli = x_blk_r[0], x_blk_i[0]           # (L1, W) natural
        # conj-mirror X[(m - k) % m] for k = j1*L2 + s*W + l:
        # lanes l >= 1: mirror chunk C2-1-s, rows flipped, lanes W-l
        mr = _flip_sublanes(m_blk_r[0])
        mi = _flip_sublanes(m_blk_i[0])
        Xmr = _dot(mr, E1w[...])
        Xmi = _dot(mi, E1w[...])
        # straggler lane l = 0: wrap chunk (C2-s)%C2 column 0, rows
        # L1-1-j1 for s >= 1, rotated (L1-j1)%L1 for s = 0; its [0, 0]
        # element for s = 0 is bin m (the Nyquist), delivered via the
        # nyq pad input.
        scol_r = _flip_sublanes(w_blk_r[0][:, :1])
        scol_i = _flip_sublanes(w_blk_i[0][:, :1])
        rot_r = _roll1_sublanes(scol_r)
        rot_i = _roll1_sublanes(scol_i)
        c0 = (s == 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (L1, 1), 0)
        nr = jnp.where(jnp.logical_and(c0, row == 0), nyq_r[0, 0, 0],
                       jnp.where(c0, rot_r, scol_r))
        ni = jnp.where(jnp.logical_and(c0, row == 0), jnp.float32(0.0),
                       jnp.where(c0, rot_i, scol_i))
        lane = jax.lax.broadcasted_iota(jnp.int32, (L1, W), 1)
        Xmr = jnp.where(lane == 0, nr, Xmr)
        Xmi = jnp.where(lane == 0, ni, Xmi)
        # E = (Xl + conj(Xm))/2, D = (Xl - conj(Xm))/2, O = w^{+k} D,
        # Z = E + i*O  (w = exp(+2*pi*i/n): inverse basis)
        Er = 0.5 * (Xlr + Xmr)
        Ei = 0.5 * (Xli - Xmi)
        Dr = 0.5 * (Xlr - Xmr)
        Di = 0.5 * (Xli + Xmi)
        p2r = p2r_blk[0]                            # (1, W)
        p2i = p2i_blk[0]
        Wr = A2r[...] * p2r - A2i[...] * p2i        # (L1, W) rank-1
        Wi = A2r[...] * p2i + A2i[...] * p2r
        Or_ = Dr * Wr - Di * Wi
        Oi = Dr * Wi + Di * Wr
        Zr = Er - Oi
        Zi = Ei + Or_
        tabs1 = (Iar1[...], Iai1[...], Ibr1[...], Ibi1[...],
                 itw1r[...], itw1i[...])
        yr, yi = _col_fft_vmem(Zr, Zi, tabs1, fa1, fb1)
        ar = ar_blk[0]
        ai = ai_blk[0]
        wr = ar * Pr[...] - ai * Pi[...]
        wi = ar * Pi[...] + ai * Pr[...]
        tr = yr * wr - yi * wi
        ti = yr * wi + yi * wr
        for g in range(G1):
            rs = slice(g * R, (g + 1) * R)          # static
            ls = pl.ds(s * W, W)                    # dynamic sublane
            M4r[g, ls, :] = jnp.transpose(tr[rs, :], (1, 0))
            M4i[g, ls, :] = jnp.transpose(ti[rs, :], (1, 0))

    @pl.when(s >= C2)
    def _phase_b():
        g = s - C2
        tabs2 = (Iar2[...], Iai2[...], Ibr2[...], Ibi2[...],
                 itw2r[...], itw2i[...])
        yr, yi = _col_fft_vmem(M4r[g], M4i[g], tabs2, fa2, fb2)
        # interleave: out[t2, 2r] = Re z, out[t2, 2r+1] = Im z via the
        # transposed selection matmuls ((L2, R) @ (R, 2R))
        o_ref[0] = _dot(yr, Se[...].T) + _dot(yi, So[...].T)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def _irfft_resident_impl(xr, xi, *, interpret: bool, scale=None):
    B, h = xr.shape
    m = h - 1
    n = 2 * m
    L1, L2 = _split_sides(m)
    W = LANES
    R = min(LANES, L1)
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)
    from fftlab.core.types import Direction

    inv = Direction.INVERSE
    eff = (1.0 / m) * (scale if scale is not None else 1.0)
    tabs1 = _col_fft_tables(L1, inv)
    tabs2 = _col_fft_tables(L2, inv, eff)   # 1/m + user scale ride here
    A, P = _rank1_twiddle_np(L1, L2, W, inv)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))
    Pi = jnp.asarray(P.imag.astype(np.float32))
    Se, So = _pack_sel(R)
    E1w = _lane_mirror(W)
    # repack twiddle w^{+k}, w = exp(+2*pi*i/n), k = j1*L2 + j2: rank-1
    # over (j1, j2) — NOTE the roles swap vs the forward unpack (here
    # the ROW index j1 carries the L2 stride).
    j1 = np.arange(L1, dtype=np.float64)
    j2 = np.arange(L2, dtype=np.float64)
    a2 = np.exp(2j * np.pi * (j1 * L2 % n) / n)
    p2 = np.exp(2j * np.pi * j2 / n)
    A2r = jnp.asarray(a2.real.astype(np.float32)).reshape(L1, 1)
    A2i = jnp.asarray(a2.imag.astype(np.float32)).reshape(L1, 1)
    C2 = L2 // W
    G1 = L1 // R
    p2r = jnp.asarray(p2.real.astype(np.float32)).reshape(C2, 1, W)
    p2i = jnp.asarray(p2.imag.astype(np.float32)).reshape(C2, 1, W)

    x3r = xr[:, :m].reshape(B, L1, L2)
    x3i = xi[:, :m].reshape(B, L1, L2)
    # Nyquist pad: a (B, 8, 128) block whose [b, 0, 0] is bin m (real)
    nyq = jnp.zeros((B, _PAD_ROWS, LANES), xr.dtype)
    nyq = nyq.at[:, 0, 0].set(xr[:, m])
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = xr.dtype
    nat = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    mir = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, C2 - 1 - jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    wrp = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, (C2 - jnp.minimum(s, C2 - 1)) % C2),
        memory_space=pltpu.VMEM)
    nyq_blk = pl.BlockSpec(
        (1, _PAD_ROWS, LANES), lambda b, s: (b, 0, 0),
        memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    p2_blk = pl.BlockSpec(
        (1, 1, W),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L2, 2 * R),
        lambda b, s: (b, 0, jnp.maximum(s - C2, 0)),
        memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_irfft_resident_kernel, L1=L1, L2=L2, W=W,
                          R=R, fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2),
        grid=(B, C2 + G1),
        in_specs=[nat, nat, mir, mir, wrp, wrp, nyq_blk]
                 + [const] * 12 + [a_blk, a_blk, const, const]
                 + [const] * 5 + [p2_blk, p2_blk],
        out_specs=out_blk,
        out_shape=jax.ShapeDtypeStruct((B, L2, 2 * L1), dt),
        scratch_shapes=[
            pltpu.VMEM((G1, L2, R), dt),
            pltpu.VMEM((G1, L2, R), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (fa2 + fb2)) * m * B,
            transcendentals=0,
            bytes_accessed=3 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3r, x3i, x3r, x3i, x3r, x3i, nyq,
      *tabs1, *tabs2, Ar, Ai, Pr, Pi,
      jnp.asarray(Se), jnp.asarray(So), jnp.asarray(E1w),
      A2r, A2i, p2r, p2i)
    # (B, L2, 2*L1) flattens to [b, 2*(t2*L1 + t1) + (0|1)] = the
    # interleaved natural real signal
    return y.reshape(B, n)


def irfft_resident(Xr, Xi, scale=None, interpret: bool | None = None):
    """One-sided (re, im) [..., n//2+1] -> real [..., n] in ONE HBM
    residency (fused Hermitian repack + half-size inverse c2c +
    interleave). 1/n is NOT applied beyond the internal 1/m — matching
    irfft_split's contract the caller never sees: the composition
    irfft_resident(rfft_resident(x)) == x exactly as with the split
    pipeline (the pack halves n, so 1/m IS the full normalization).
    `scale` multiplies the output for free."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Xr = jnp.asarray(Xr, jnp.float32)
    Xi = jnp.asarray(Xi, jnp.float32)
    batch = Xr.shape[:-1]
    h = int(Xr.shape[-1])
    n = 2 * (h - 1)
    if not supported_rfft_resident(n):
        raise ValueError(
            f"irfft_resident supports h = n//2+1 with n//2 in the "
            f"resident window [2^15, 2^20]; got h={h}")
    B = 1
    for d in batch:
        B *= int(d)
    y = _irfft_resident_impl(Xr.reshape(B, h), Xi.reshape(B, h),
                             interpret=bool(interpret), scale=scale)
    return y.reshape(*batch, n)


def rfft_resident(x, scale=None, interpret: bool | None = None):
    """Real [..., n] -> one-sided (re, im) [..., n//2+1] in ONE HBM
    residency (fused pack + half-size c2c + Hermitian unpack).

    `scale` multiplies the spectrum for free (folded into the unpack
    constants). Requires supported_rfft_resident(n)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(x, jnp.float32)
    batch = x.shape[:-1]
    n = int(x.shape[-1])
    if not supported_rfft_resident(n):
        raise ValueError(
            f"rfft_resident supports even n with n//2 in the resident "
            f"window [2^15, 2^20]; got n={n}")
    B = 1
    for d in batch:
        B *= int(d)
    yr, yi = _rfft_resident_impl(x.reshape(B, n),
                                 interpret=bool(interpret),
                                 scale=scale)
    h = n // 2 + 1
    return yr.reshape(*batch, h), yi.reshape(*batch, h)
