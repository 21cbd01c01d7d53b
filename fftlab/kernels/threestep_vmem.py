"""Three-pass FFT for huge n (2^21..2^26): the 16M-class fast path.
(2^22 is the default dispatch route; 2^21 is covered but the two-pass
kernel wins there.)

The two-pass kernel (kernels/fourstep_vmem.py) caps at n = 2^21 because
a pass's VMEM slabs scale with the side length. This module factors
n = F1*F2*F3 (each side <= 2048, slabs stay small) and runs THREE
passes, each structurally identical to the two-pass kernel's passes:

  pass 1  view (B, F1, F2*F3): column FFT over j1 (strided 128-lane
          slabs), fused twiddle W_n^{k1*j23}       -> [b, k1, j2, j3]
  pass 2  view (B*F1, F2, F3): column FFT over j2, fused twiddle
          W_{F2*F3}^{k2*j3}, OUTPUT WRITTEN THROUGH A TRANSPOSED VIEW
          (B, F2, F1*F3) so the (k1, k2) axes swap at block granularity
          during the store                        -> [b, k2, k1, j3]
  pass 3  view (B*F2*F1, F3): contiguous row slabs, in-VMEM transpose,
          column FFT over j3                      -> [b, k3, k2, k1]

[b, k3, k2, k1] flattens to the NATURAL spectrum (mixed-radix DIT index
k = k1 + F1*k2 + F1*F2*k3) — zero XLA fixup passes, exactly like the
two-pass kernel. Total HBM traffic: 3 passes, full stop — the fused
twiddles enter in rank-1 form (per-block column x fixed plane), so no
twiddle table is ever streamed.

The in-VMEM column FFTs and the natural-order-by-contraction trick are
shared with kernels/fourstep_vmem.py (_col_fft_vmem). Reference anchor:
parallel_fft.c:213-272 (the four-step this generalizes to three levels).
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
    _col_fft_tables,
    _col_fft_vmem,
    _pass1_kernel,
    _rank1_twiddle_np,
    _split_factors,
)

LANES = 128

# Lower bound 2^21: the two-pass kernel also covers 2^21 (and wins
# there — 2 HBM passes vs 3), but 2^22 CRASHES the backend compiler in
# the two-pass form (L=2048 slabs x batch operands, HTTP 500 — r4
# wisdom sweep), so the three-pass kernel is the 2^22 route;
# interpret-verified 134.0-134.4 dB at 2^21/2^22 ((128,128,128) and
# (128,128,256) sides).
MIN_N3 = 1 << 21
MAX_N3 = 1 << 26


def supported_huge(n: int) -> bool:
    return is_power_of_two(n) and MIN_N3 <= n <= MAX_N3


def _split_three(n: int) -> tuple[int, int, int]:
    """n = F1*F2*F3, pow2 sides <= 2048, F3 >= 128, F1*F2 >= 128."""
    e = log2_int(n)
    e3 = max((e + 2) // 3, 7)
    e1 = (e - e3) // 2
    e2 = e - e3 - e1
    return 1 << e1, 1 << e2, 1 << e3


# Column FFT + rank-1 fused twiddle: fourstep_vmem._pass1_kernel is
# shape-agnostic over leading singleton block dims, so it serves the
# row-major (1, F1, W) and blocked (1, 1, F1, L) layouts here too (it
# kills the n-sized twiddle table the naive form would need at 2^26).
_pass_col_kernel = _pass1_kernel


def _pass_row_kernel(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                     or_ref, oi_ref, *, fa, fb):
    """Contiguous row slab -> in-VMEM transpose -> column FFT."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    xr = jnp.transpose(xr_ref[...], (1, 0))
    xi = jnp.transpose(xi_ref[...], (1, 0))
    yr, yi = _col_fft_vmem(xr, xi, tabs, fa, fb)
    or_ref[0] = yr
    oi_ref[0] = yi


def _pass_row_lanes_kernel(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                           or_ref, oi_ref, *, fa, fb):
    """Contiguous row slab -> LANE-axis FFT (fourstep_vmem.
    _row_fft_lanes): the (F3, LANES) corner turn that the default
    kernel does as a whole-slab jnp.transpose rides the MXU
    contraction axes instead — the same move that removed every
    transpose from the resident v5/v6 kernels. The kernel's only
    in-VMEM transpose is pass 3's, so this variant makes the whole
    three-pass path transpose-free. Tables must be built with
    factors=(F3//128, 128)."""
    from fftlab.kernels.fourstep_vmem import _row_fft_lanes

    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    yr, yi = _row_fft_lanes(xr_ref[...], xi_ref[...], tabs, fa, fb)
    or_ref[0] = yr
    oi_ref[0] = yi


def _blocked_huge_default() -> bool:
    """Blocked-intermediate switch for the three-pass kernel.

    DEFAULT ON since r5: two independent paired campaigns measured the
    blocked intermediates ~9% faster than row-major at 2^24
    (ts_blocked vs ts_r128 median ratio 0.9144 r5c1 / 0.9092 r5c2,
    n=32 each, IQR < 0.02 — bench_artifacts/paired_ab.jsonl), the
    two-campaign flip rule. Sizes whose slabs don't fit stay row-major
    via blocked_huge_feasible. FFTLAB_TS_BLOCKED=0 opts out."""
    import os

    return os.environ.get("FFTLAB_TS_BLOCKED", "1") != "0"


def blocked_huge_feasible(n: int, r2: int = 8) -> bool:
    """Pass 2's blocked slabs (8 double-buffered in/out planes of
    F2*r2*128 floats) must fit VMEM alongside the tables: F2 <= 256
    keeps them at 8 MB. Larger n (2^26 -> F2=512) stays row-major."""
    F1, F2, _ = _split_three(n)
    return F2 <= 256 and F1 % max(r2, 8) == 0


def _burst_widths(n: int) -> tuple[int, int]:
    """(w1, r3) burst knobs for the blocked variant, env-overridable via
    FFTLAB_TS_W1 / FFTLAB_TS_R3 (resolved OUTSIDE jit — static cache
    keys). w1 widens the strided pass-1 read burst to 4*w1 bytes; r3
    widens the strided natural-order pass-3 write burst to 4*r3 bytes.
    Both must divide their side (F3 / F1). Defaults keep the
    compile-proven 128."""
    import os

    F1, _, F3 = _split_three(n)
    w1 = int(os.environ.get("FFTLAB_TS_W1", str(LANES)))
    r3 = int(os.environ.get("FFTLAB_TS_R3", str(LANES)))
    if w1 % LANES or r3 % LANES:
        raise ValueError(f"FFTLAB_TS_W1/R3 ({w1}/{r3}) must be multiples "
                         f"of {LANES}")
    # Clamp to the largest width the factorization admits: a sweep sets
    # one env value across sizes whose sides differ (2^23 has F1=128).
    # Halving must preserve the multiple-of-LANES invariant — a
    # non-pow2 multiple like 384 would otherwise degrade to 1 and build
    # pathological rank-1 lane-dim-1 blocks. Sides are pow2 multiples
    # of LANES, so LANES always divides them.
    def clamp(w: int, side: int) -> int:
        while side % w and w > LANES:
            w //= 2
        return w if (side % w == 0 and w % LANES == 0) else LANES

    return clamp(w1, F3), clamp(r3, F1)


@functools.partial(
    jax.jit, static_argnames=("direction", "interpret", "blocked", "scale",
                              "w1", "r3", "lanes")
)
def _fft_huge_impl(xr, xi, *, direction: Direction, interpret: bool,
                   blocked: bool = False, scale=None,
                   w1: int = LANES, r3: int = LANES,
                   lanes: bool = False):
    eff = (1.0 / xr.shape[-1] if direction == Direction.INVERSE else 1.0)
    eff *= (scale if scale is not None else 1.0)
    scale = None if eff == 1.0 else eff
    if blocked:
        return _fft_huge_blocked(xr, xi, direction, interpret, scale,
                                 w1=w1, r3=r3)
    B, n = xr.shape
    F1, F2, F3 = _split_three(n)
    C23 = (F2 * F3) // LANES
    C3 = F3 // LANES
    Q = (B * F1 * F2) // LANES  # pass-3 row-slab count
    fa1, fb1 = _split_factors(F1)
    fa2, fb2 = _split_factors(F2)
    # lanes=True: pass 3 contracts the slab's lane axis directly
    # (transpose-free, factors pinned to (F3/128, 128)); see
    # _pass_row_lanes_kernel.
    fa3, fb3 = (F3 // LANES, LANES) if lanes else _split_factors(F3)
    tabs1 = _col_fft_tables(F1, direction)
    tabs2 = _col_fft_tables(F2, direction)
    tabs3 = _col_fft_tables(F3, direction, scale,  # scale rides pass 3
                            factors=(fa3, fb3))
    const = pl.BlockSpec(memory_space=pltpu.VMEM)

    # ---- pass 1: (B, F1, F2*F3), fused W_n^{k1*j23} (rank-1 form) -----
    A1, P1 = _rank1_twiddle_np(F1, F2 * F3, LANES, direction)
    A1r = jnp.asarray(A1.real.astype(np.float32))
    A1i = jnp.asarray(A1.imag.astype(np.float32))
    P1r = jnp.asarray(P1.real.astype(np.float32))
    P1i = jnp.asarray(P1.imag.astype(np.float32))
    x3r = xr.reshape(B, F1, F2 * F3)
    x3i = xi.reshape(B, F1, F2 * F3)
    col1 = pl.BlockSpec((1, F1, LANES), lambda c, b: (b, 0, c),
                        memory_space=pltpu.VMEM)
    a1b = pl.BlockSpec((1, F1, 1), lambda c, b: (c, 0, 0),
                       memory_space=pltpu.VMEM)
    m1r, m1i = pl.pallas_call(
        functools.partial(_pass_col_kernel, fa=fa1, fb=fb1),
        grid=(C23, B),
        in_specs=[col1, col1] + [const] * 6
                 + [a1b, a1b, const, const],
        out_specs=(col1, col1),
        out_shape=(jax.ShapeDtypeStruct((B, F1, F2 * F3), xr.dtype),) * 2,
        interpret=interpret,
    )(x3r, x3i, *tabs1, A1r, A1i, P1r, P1i)

    # ---- pass 2: (B*F1, F2, F3), fused W_{F2F3}^{k2*j3} (rank-1),
    # transposed store into (B, F2, F1*F3): the (k1, k2) swap is free --
    A2, P2 = _rank1_twiddle_np(F2, F3, LANES, direction)
    A2r = jnp.asarray(A2.real.astype(np.float32))
    A2i = jnp.asarray(A2.imag.astype(np.float32))
    P2r = jnp.asarray(P2.real.astype(np.float32))
    P2i = jnp.asarray(P2.imag.astype(np.float32))
    in2r = m1r.reshape(B * F1, 1, F2, F3)
    in2i = m1i.reshape(B * F1, 1, F2, F3)
    col2 = pl.BlockSpec((1, 1, F2, LANES), lambda c, g: (g, 0, 0, c),
                        memory_space=pltpu.VMEM)
    a2b = pl.BlockSpec((1, F2, 1), lambda c, g: (c, 0, 0),
                       memory_space=pltpu.VMEM)
    # out view (B, F2, F1*F3); block lane-offset = k1*C3 + c
    out2 = pl.BlockSpec(
        (1, F2, LANES),
        lambda c, g: (g // F1, 0, (g % F1) * C3 + c),
        memory_space=pltpu.VMEM,
    )
    m2r, m2i = pl.pallas_call(
        functools.partial(_pass2t_kernel, fa=fa2, fb=fb2),
        grid=(C3, B * F1),
        in_specs=[col2, col2] + [const] * 6
                 + [a2b, a2b, const, const],
        out_specs=(out2, out2),
        out_shape=(jax.ShapeDtypeStruct((B, F2, F1 * F3), xr.dtype),) * 2,
        interpret=interpret,
    )(in2r, in2i, *tabs2, A2r, A2i, P2r, P2i)

    # ---- pass 3: (B*F2*F1, F3) rows -> transpose -> FFT over j3 --------
    in3r = m2r.reshape(B * F2 * F1, F3)
    in3i = m2i.reshape(B * F2 * F1, F3)
    row3 = pl.BlockSpec((LANES, F3), lambda q: (q, 0),
                        memory_space=pltpu.VMEM)
    # out view (B, F3, F2*F1): combo q covers 128 (k2, k1) pairs
    P = (F2 * F1) // LANES
    out3 = pl.BlockSpec(
        (1, F3, LANES),
        lambda q: (q // P, 0, q % P),
        memory_space=pltpu.VMEM,
    )
    pass3 = _pass_row_lanes_kernel if lanes else _pass_row_kernel
    yr, yi = pl.pallas_call(
        functools.partial(pass3, fa=fa3, fb=fb3),
        grid=(Q,),
        in_specs=[row3, row3] + [const] * 6,
        out_specs=(out3, out3),
        out_shape=(jax.ShapeDtypeStruct((B, F3, F2 * F1), xr.dtype),) * 2,
        interpret=interpret,
    )(in3r, in3i, *tabs3)

    return yr.reshape(B, n), yi.reshape(B, n)


def _pass2t_kernel(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                   ar_ref, ai_ref, pr_ref, pi_ref,
                   or_ref, oi_ref, *, fa, fb):
    """Pass-2 body: column FFT + rank-1 twiddle; the transposed
    placement is done by the out BlockSpec index map, not in-kernel."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    yr, yi = _col_fft_vmem(xr_ref[0, 0], xi_ref[0, 0], tabs, fa, fb)
    ar = ar_ref[0]
    ai = ai_ref[0]
    pr = pr_ref[...]
    pi = pi_ref[...]
    wr = ar * pr - ai * pi
    wi = ar * pi + ai * pr
    or_ref[0] = yr * wr - yi * wi
    oi_ref[0] = yr * wi + yi * wr


# ---------------------------------------------------------------------------
# Blocked-intermediate variant: the row-major data flow above makes five
# of the six HBM accesses 512-byte strided row bursts. Routing the two
# intermediates through DMA-block-shaped layouts leaves only pass 1's
# column read and pass 3's natural-order write strided (the minimum the
# decomposition allows). Same math — interpret-mode tests assert bit
# equality with the row-major variant.
# ---------------------------------------------------------------------------


# Same kernel body as the row-major pass 1 — fourstep_vmem._pass1_kernel
# reshapes to the out ref's rank, so storing to the blocked
# (B, C23, F1, L) mid needs no separate copy.
_pass1_kernel_blk3 = _pass1_kernel


def _pass2_kernel_blk3(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                       ar_ref, ai_ref, pr_ref, pi_ref,
                       or_ref, oi_ref, *, fa, fb):
    """Blocked pass 2: block (1, F2, 1, R2, L) carries R2 k1-rows of one
    j3 lane-chunk for all j2; the column FFT runs with R2*L lanes and
    the W_{F2F3}^{k2*j3} rank-1 twiddle broadcasts over the k1 rows
    (it depends only on (k2, j3))."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    _, F2, _, R2, L = xr_ref.shape
    x3r = xr_ref[...].reshape(F2, R2, L)
    x3i = xi_ref[...].reshape(F2, R2, L)
    yr, yi = _col_fft_vmem(x3r.reshape(F2, R2 * L),
                           x3i.reshape(F2, R2 * L), tabs, fa, fb)
    y3r = yr.reshape(F2, R2, L)
    y3i = yi.reshape(F2, R2, L)
    ar = ar_ref[0]                   # (F2, 1)
    ai = ai_ref[0]
    pr = pr_ref[...]                 # (F2, L)
    pi = pi_ref[...]
    wr = (ar * pr - ai * pi).reshape(F2, 1, L)
    wi = (ar * pi + ai * pr).reshape(F2, 1, L)
    or_ref[...] = (y3r * wr - y3i * wi).reshape(1, F2, 1, R2, L)
    oi_ref[...] = (y3r * wi + y3i * wr).reshape(1, F2, 1, R2, L)


def _pass3_kernel_blk3(xr_ref, xi_ref, Far, Fai, Fbr, Fbi, Twr, Twi,
                       or_ref, oi_ref, *, fa, fb):
    """Blocked pass 3: block (1, 1, C3, LANES, L) holds 128 k1-rows of
    one (b, k2) with all j3 split into C3 lane chunks; stitch to
    (128, F3) rows, then transpose -> column FFT over j3."""
    tabs = (Far[...], Fai[...], Fbr[...], Fbi[...], Twr[...], Twi[...])
    _, _, C3, rows, L = xr_ref.shape
    x3r = xr_ref[...].reshape(C3, rows, L)
    x3i = xi_ref[...].reshape(C3, rows, L)
    xr = jnp.transpose(x3r, (1, 0, 2)).reshape(rows, C3 * L)  # (128, F3)
    xi = jnp.transpose(x3i, (1, 0, 2)).reshape(rows, C3 * L)
    yr, yi = _col_fft_vmem(jnp.transpose(xr, (1, 0)),
                           jnp.transpose(xi, (1, 0)), tabs, fa, fb)
    or_ref[0] = yr
    oi_ref[0] = yi


def _fft_huge_blocked(xr, xi, direction: Direction, interpret: bool,
                      scale: float | None = None, r2: int = 8,
                      w1: int = LANES, r3: int = LANES):
    """Three passes with blocked intermediates. `r2` = k1-rows per
    pass-2 program (VMEM: in+out slabs are F2*r2*w1 floats each).
    `w1` = pass-1 lane-chunk width: the strided input read's burst is
    4*w1 bytes, so doubling it halves the per-burst overhead at the
    cost of bigger slabs. `r3` = pass-3 k1-rows per program: the
    strided natural-order write's burst is 4*r3 bytes."""
    B, n = xr.shape
    F1, F2, F3 = _split_three(n)
    if w1 % LANES or F3 % w1:
        raise ValueError(f"w1={w1} must be a multiple of {LANES} dividing "
                         f"F3={F3}")
    if r3 % LANES or F1 % r3:
        raise ValueError(f"r3={r3} must be a multiple of {LANES} dividing "
                         f"F1={F1}")
    C23 = (F2 * F3) // w1
    C3 = F3 // w1
    while F1 % r2:
        r2 //= 2
    G1 = F1 // r2
    fa1, fb1 = _split_factors(F1)
    fa2, fb2 = _split_factors(F2)
    fa3, fb3 = _split_factors(F3)
    tabs1 = _col_fft_tables(F1, direction)
    tabs2 = _col_fft_tables(F2, direction)
    tabs3 = _col_fft_tables(F3, direction, scale)  # scale rides pass 3
    const = pl.BlockSpec(memory_space=pltpu.VMEM)

    # ---- pass 1: strided column read (unavoidable), blocked write -----
    A1, P1 = _rank1_twiddle_np(F1, F2 * F3, w1, direction)
    A1r = jnp.asarray(A1.real.astype(np.float32))
    A1i = jnp.asarray(A1.imag.astype(np.float32))
    P1r = jnp.asarray(P1.real.astype(np.float32))
    P1i = jnp.asarray(P1.imag.astype(np.float32))
    x3r = xr.reshape(B, F1, F2 * F3)
    x3i = xi.reshape(B, F1, F2 * F3)
    col1 = pl.BlockSpec((1, F1, w1), lambda c, b: (b, 0, c),
                        memory_space=pltpu.VMEM)
    a1b = pl.BlockSpec((1, F1, 1), lambda c, b: (c, 0, 0),
                       memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((1, 1, F1, w1), lambda c, b: (b, c, 0, 0),
                        memory_space=pltpu.VMEM)
    m1r, m1i = pl.pallas_call(
        functools.partial(_pass1_kernel_blk3, fa=fa1, fb=fb1),
        grid=(C23, B),
        in_specs=[col1, col1] + [const] * 6
                 + [a1b, a1b, const, const],
        out_specs=(blk1, blk1),
        out_shape=(jax.ShapeDtypeStruct((B, C23, F1, w1), xr.dtype),) * 2,
        interpret=interpret,
    )(x3r, x3i, *tabs1, A1r, A1i, P1r, P1i)

    # ---- pass 2: contiguous read AND write through the blocked view ---
    # mid1 blocked block index c = j2*C3 + c3 -> view (B, F2, C3, F1, w1);
    # a (1, F2, 1, r2, w1) block is F2 contiguous 4*r2*w1-byte runs.
    A2, P2 = _rank1_twiddle_np(F2, F3, w1, direction)
    A2r = jnp.asarray(A2.real.astype(np.float32))
    A2i = jnp.asarray(A2.imag.astype(np.float32))
    P2r = jnp.asarray(P2.real.astype(np.float32))
    P2i = jnp.asarray(P2.imag.astype(np.float32))
    in2r = m1r.reshape(B, F2, C3, F1, w1)
    in2i = m1i.reshape(B, F2, C3, F1, w1)
    blk2 = pl.BlockSpec(
        (1, F2, 1, r2, w1),
        lambda c3, g, b: (b, 0, c3, g, 0),
        memory_space=pltpu.VMEM,
    )
    a2b = pl.BlockSpec((1, F2, 1), lambda c3, g, b: (c3, 0, 0),
                       memory_space=pltpu.VMEM)
    m2r, m2i = pl.pallas_call(
        functools.partial(_pass2_kernel_blk3, fa=fa2, fb=fb2),
        grid=(C3, G1, B),
        in_specs=[blk2, blk2] + [const] * 6
                 + [a2b, a2b, const, const],
        out_specs=(blk2, blk2),
        out_shape=(jax.ShapeDtypeStruct((B, F2, C3, F1, w1),
                                        xr.dtype),) * 2,
        interpret=interpret,
    )(in2r, in2i, *tabs2, A2r, A2i, P2r, P2i)

    # ---- pass 3: contiguous k1-chunk read, natural-order write --------
    row3 = pl.BlockSpec(
        (1, 1, C3, r3, w1),
        lambda q: (q // (F2 * (F1 // r3)),
                   (q // (F1 // r3)) % F2,
                   0, q % (F1 // r3), 0),
        memory_space=pltpu.VMEM,
    )
    P = (F2 * F1) // r3
    out3 = pl.BlockSpec(
        (1, F3, r3),
        lambda q: (q // P, 0, q % P),
        memory_space=pltpu.VMEM,
    )
    Q = B * F2 * (F1 // r3)
    yr, yi = pl.pallas_call(
        functools.partial(_pass3_kernel_blk3, fa=fa3, fb=fb3),
        grid=(Q,),
        in_specs=[row3, row3] + [const] * 6,
        out_specs=(out3, out3),
        out_shape=(jax.ShapeDtypeStruct((B, F3, F2 * F1), xr.dtype),) * 2,
        interpret=interpret,
    )(m2r.reshape(B, F2, C3, F1, w1),
      m2i.reshape(B, F2, C3, F1, w1), *tabs3)

    return yr.reshape(B, n), yi.reshape(B, n)


def fft_split_huge(xr, xi, direction=FORWARD,
                   interpret: bool | None = None,
                   blocked: bool | None = None,
                   scale: float | None = None,
                   lanes: bool | None = None):
    """Batched huge-n FFT on split planes via the three-pass kernel.

    xr, xi: float32 [..., n], n = 2^21..2^26 pow2. Forward unscaled /
    inverse 1/n. Natural-order output. `blocked` picks the intermediate
    layout (None = FFTLAB_TS_BLOCKED env; silently row-major where the
    blocked slabs would not fit VMEM — see blocked_huge_feasible).
    `scale` folds an extra output normalization into the pass-3 tables
    for free (composes with the inverse 1/n). `lanes` (row-major
    variant only; None = FFTLAB_TS_LANES env) runs pass 3 as a
    lane-axis FFT, removing the kernel's only in-VMEM transpose at the
    cost of unbalanced pass-3 factors — the device A/B decides."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_huge(n):
        raise ValueError(
            f"fft_split_huge supports pow2 n in [{MIN_N3}, {MAX_N3}]; got {n}"
        )
    if blocked is None:
        blocked = _blocked_huge_default()
    blocked = bool(blocked) and blocked_huge_feasible(n)
    w1, r3 = _burst_widths(n) if blocked else (LANES, LANES)
    if lanes is None:
        import os

        lanes = os.environ.get("FFTLAB_TS_LANES", "0") != "0"
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    yr, yi = _fft_huge_impl(
        xr.reshape(B, n), xi.reshape(B, n),
        direction=Direction(int(direction)), interpret=bool(interpret),
        blocked=blocked, scale=None if scale is None else float(scale),
        w1=w1, r3=r3, lanes=bool(lanes) and not blocked,
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


# Differentiability (same adjoint structure as fourstep_vmem).


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fft_split_huge_ad(xr, xi, direction=FORWARD,
                      interpret: bool | None = None):
    """`fft_split_huge` with a custom VJP (differentiable)."""
    return fft_split_huge(xr, xi, direction, interpret)


from fftlab.kernels._ad import make_vjp_rules

fft_split_huge_ad.defvjp(*make_vjp_rules(fft_split_huge))
