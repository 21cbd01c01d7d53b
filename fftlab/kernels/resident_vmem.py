"""One-HBM-residency FFT for mid/large n (2^15..2^20): read the whole
signal into VMEM once, run BOTH four-step passes on the VMEM-resident
matrix, write the natural-order spectrum once.

The two-pass kernel (kernels/fourstep_vmem.py) is floor-limited at
32 B/sample: each pass reads and writes HBM. But a 1M-point split-f32
signal is only 8 MB — it FITS in VMEM next to chunk workspaces, so this
kernel runs BOTH four-step passes against a VMEM-resident blocked
matrix and touches HBM exactly once per direction: 16 B/sample, HALF
the two-pass floor.

Delivery is pure BlockSpec over a (B, C2 + G1) grid with CLAMPED index
maps (see _resident_kernel) — a manual-DMA formulation of the same
structure measured ~3x worse per byte on this backend and 20-50x
slower to compile (bench_artifacts/dma_shapes.jsonl, resident_diag).

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

from fftlab.core.types import Direction, FORWARD, is_power_of_two
from fftlab.kernels.fourstep_vmem import (
    LANES,
    _col_fft_lanes,
    _col_fft_tables,
    _col_fft_vmem,
    _rank1_twiddle_np,
    _split_factors,
    _split_sides,
)

MIN_N = 1 << 15
# The blocked resident matrix (both planes) + double-buffered in/out
# blocks + tables + chunk temporaries must fit 16 MB VMEM: at 2^20 the
# matrix is 8 MB and the rest ~6 MB (device-verified). 2^21 would need
# a 16 MB matrix alone.
MAX_N = 1 << 20


def supported_resident(n: int) -> bool:
    return is_power_of_two(n) and MIN_N <= n <= MAX_N


def _dimsem():
    """Optional grid dimension semantics for the resident kernels:
    FFTLAB_RES_DIMSEM=1 declares the batch dimension `parallel` (each
    row fully rewrites the scratch before reading it, so reordering is
    safe) which lets Mosaic pipeline across rows. Opt-in pending a
    device A/B (scripts/tpu_paired_ab.py v4_ds question)."""
    import os

    if os.environ.get("FFTLAB_RES_DIMSEM", "0") != "0":
        return {"dimension_semantics": ("parallel", "arbitrary")}
    return {}


def _out_chunk_rows(L1: int, override: int | None = None) -> int:
    """Output-chunk width R (k1 values per phase-B chunk). Wider R means
    wider strided-write bursts (R*4 B at stride L1*4 B) but bigger
    out-block buffers (2 x L2*R*4 x 2 planes, Pallas double-buffered)
    and a bigger phase-B assembly scratch. An explicit `override`
    (fft_split_resident's out_rows) outranks the FFTLAB_RES_R env knob;
    both exist for device tuning (scripts/tpu_resident_ab.py sweeps
    out_rows candidates in one process)."""
    import os

    forced = override if override is not None \
        else os.environ.get("FFTLAB_RES_R")
    if forced:
        r = int(forced)
        if r % LANES or L1 % r:
            raise ValueError(
                f"resident out_rows={r} must be a multiple of {LANES} "
                f"dividing L1={L1}"
            )
        return r
    return min(LANES, L1)


def _resident_kernel(xr_blk, xi_blk,
                     Far1, Fai1, Fbr1, Fbi1, twr1, twi1,
                     Far2, Fai2, Fbr2, Fbi2, twr2, twi2,
                     ar_blk, ai_blk, Pr, Pi,
                     or_blk, oi_blk,
                     Mbr, Mbi, T2r, T2i,
                     *, L1: int, L2: int, W: int, R: int,
                     fa1: int, fb1: int, fa2: int, fb2: int):
    """Grid (B, C2 + G1), s innermost. Phase A (s < C2): column FFT of
    the BlockSpec-delivered x chunk + rank-1 twiddle, stored into the
    blocked resident scratch Mb[s]. Phase B (s >= C2, g = s - C2):
    assemble the (L2, R) transposed row chunk from Mb via per-tile
    transposes, column FFT, write the out block.

    NO manual DMA anywhere: the clamped index maps keep the in block
    parked at its last chunk during phase B and the out block parked at
    chunk 0 during phase A — revisited indices are neither refetched nor
    reflushed, so the HBM traffic is exactly one residency while Mosaic
    double-buffers and pipelines all block transfers. (A manual-DMA
    variant of this kernel measured 3x worse per byte than BlockSpec
    delivery on this backend — bench_artifacts/dma_shapes.jsonl.)"""
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        tabs1 = (Far1[...], Fai1[...], Fbr1[...], Fbi1[...],
                 twr1[...], twi1[...])
        yr, yi = _col_fft_vmem(xr_blk[0], xi_blk[0], tabs1, fa1, fb1)
        ar = ar_blk[0]         # (L1, 1) rank-1 twiddle column
        ai = ai_blk[0]
        wr = ar * Pr[...] - ai * Pi[...]
        wi = ar * Pi[...] + ai * Pr[...]
        Mbr[s] = yr * wr - yi * wi
        Mbi[s] = yr * wi + yi * wr

    @pl.when(s >= C2)
    def _phase_b():
        g = s - C2
        # T2[c*W + l, r] = Mb[c, g*R + r, l]: C2 tile-sized transposes
        # assemble the (L2, R) column matrix (dynamic sublane slice at
        # g*R, static lane placement at c*W — no dynamic lane indexing)
        for c in range(C2):
            rs = pl.ds(g * R, R)
            ls = slice(c * W, (c + 1) * W)
            T2r[ls, :] = jnp.transpose(Mbr[c, rs, :], (1, 0))
            T2i[ls, :] = jnp.transpose(Mbi[c, rs, :], (1, 0))
        tabs2 = (Far2[...], Fai2[...], Fbr2[...], Fbi2[...],
                 twr2[...], twi2[...])
        yr, yi = _col_fft_vmem(T2r[...], T2i[...], tabs2, fa2, fb2)
        or_blk[0] = yr
        oi_blk[0] = yi


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
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = xr.dtype
    C2 = L2 // W
    G1 = L1 // R
    # Clamped index maps: during phase B the in block stays parked at
    # chunk C2-1 (no refetch — the index does not change); during phase
    # A the out block stays parked at chunk 0 and is flushed only when
    # s moves past C2, by which point phase-B g=0 has written it.
    in_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L2, R),
        lambda b, s: (b, 0, jnp.maximum(s - C2, 0)),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_resident_kernel, L1=L1, L2=L2, W=W, R=R,
                          fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2),
        grid=(B, C2 + G1),
        in_specs=[in_blk, in_blk] + [const] * 12 + [a_blk, a_blk,
                                                    const, const],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L2, L1), dt),
                   jax.ShapeDtypeStruct((B, L2, L1), dt)),
        scratch_shapes=[
            pltpu.VMEM((C2, L1, W), dt),   # blocked resident matrix (re)
            pltpu.VMEM((C2, L1, W), dt),   # (im)
            pltpu.VMEM((L2, R), dt),       # phase-B assembly (re)
            pltpu.VMEM((L2, R), dt),       # (im)
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=2 * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1, *tabs2, Ar, Ai, Pr, Pi)
    # (B, L2, L1) flattens to [b, k2*L1 + k1] = natural order
    return yr.reshape(B, n), yi.reshape(B, n)


def _resident_v4_kernel(xr_blk, xi_blk,
                        Far1, Fai1, Fbr1, Fbi1, twr1, twi1,
                        Far2, Fai2, Fbr2, Fbi2, twr2, twi2,
                        ar_blk, ai_blk, Pr, Pi,
                        or_ref, oi_ref, M4r, M4i,
                        *, L1, L2, W, R, fa1, fb1, fa2, fb2,
                        prec=None):
    """v4 formulation: the assembly transposes move from phase B to
    phase A. v2's phase B does C2 transposes per step whose SOURCE is
    a dynamic-sublane slice of the scratch, on the same critical path
    as the out-block DMA. Here phase A stores its (L1, W) chunk
    already transposed into per-g slots of a (G1, L2, R) scratch —
    same total transpose count, but the transpose source slice is
    static (only the STORE destination keeps a dynamic sublane
    offset, s*W), and the work overlaps the in-block DMA stream
    instead of the out one; phase B is PURE column-FFT + store."""
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        tabs1 = (Far1[...], Fai1[...], Fbr1[...], Fbi1[...],
                 twr1[...], twi1[...])
        yr, yi = _col_fft_vmem(xr_blk[0], xi_blk[0], tabs1, fa1, fb1,
                               prec)
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
        tabs2 = (Far2[...], Fai2[...], Fbr2[...], Fbi2[...],
                 twr2[...], twi2[...])
        yr, yi = _col_fft_vmem(M4r[g], M4i[g], tabs2, fa2, fb2, prec)
        or_ref[0] = yr
        oi_ref[0] = yi


@functools.partial(
    jax.jit,
    static_argnames=("direction", "interpret", "scale", "R", "prec"),
)
def _fft_resident_v4_impl(xr, xi, *, direction: Direction,
                          interpret: bool, scale=None,
                          R: int | None = None,
                          prec: str | None = None):
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
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))
    Pi = jnp.asarray(P.imag.astype(np.float32))

    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = xr.dtype
    C2 = L2 // W
    G1 = L1 // R
    in_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L2, R),
        lambda b, s: (b, 0, jnp.maximum(s - C2, 0)),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_resident_v4_kernel, L1=L1, L2=L2, W=W, R=R,
                          fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2, prec=prec),
        grid=(B, C2 + G1),
        in_specs=[in_blk, in_blk] + [const] * 12 + [a_blk, a_blk,
                                                    const, const],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L2, L1), dt),
                   jax.ShapeDtypeStruct((B, L2, L1), dt)),
        scratch_shapes=[
            pltpu.VMEM((G1, L2, R), dt),   # transposed resident matrix
            pltpu.VMEM((G1, L2, R), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=2 * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1, *tabs2, Ar, Ai, Pr, Pi)
    return yr.reshape(B, n), yi.reshape(B, n)


def _resident_v6_kernel(xr_blk, xi_blk,
                        Far1, Fai1, Fbr1, Fbi1, twr1, twi1,
                        Lar2, Lai2, Lbr2, Lbi2, ltw2r, ltw2i,
                        ar_blk, ai_blk, Pr, Pi,
                        or_ref, oi_ref, Mbr, Mbi,
                        *, L1, L2, W, R, fa1, fb1, la2, lb2,
                        prec=None):
    """v6 formulation: ZERO in-VMEM transposes. Phase A is v2's
    (column FFT + rank-1 twiddle, whole-slot store — static). Phase B
    runs the length-L2 FFT directly on the (C2, R, W) slice
    Mb[:, gR:(g+1)R, :] via the LANE-CONTRACTION form
    (fourstep_vmem._col_fft_lanes): with factors (la2, lb2) =
    (L2/W, W), the j2 = c*W + l split aligns stage A's contraction
    with the SLOT axis and stage B's with the LANE axis, so the
    corner turn that v2 did as C2 dynamic-sublane transposes (the
    measured phase-B bottleneck) and v4 moved to phase A becomes part
    of the MXU contractions themselves."""
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        tabs1 = (Far1[...], Fai1[...], Fbr1[...], Fbi1[...],
                 twr1[...], twi1[...])
        yr, yi = _col_fft_vmem(xr_blk[0], xi_blk[0], tabs1, fa1, fb1,
                               prec)
        ar = ar_blk[0]
        ai = ai_blk[0]
        wr = ar * Pr[...] - ai * Pi[...]
        wi = ar * Pi[...] + ai * Pr[...]
        Mbr[s] = yr * wr - yi * wi
        Mbi[s] = yr * wi + yi * wr

    @pl.when(s >= C2)
    def _phase_b():
        g = s - C2
        tabs2 = (Lar2[...], Lai2[...], Lbr2[...], Lbi2[...],
                 ltw2r[...], ltw2i[...])
        rs = pl.ds(g * R, R)
        yr, yi = _col_fft_lanes(Mbr[:, rs, :], Mbi[:, rs, :],
                                tabs2, la2, lb2, prec)
        or_ref[0] = yr
        oi_ref[0] = yi


@functools.partial(
    jax.jit,
    static_argnames=("direction", "interpret", "scale", "R", "prec"),
)
def _fft_resident_v6_impl(xr, xi, *, direction: Direction,
                          interpret: bool, scale=None,
                          R: int | None = None,
                          prec: str | None = None):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    if R is None:
        R = min(LANES, L1)
    fa1, fb1 = _split_factors(L1)
    la2, lb2 = L2 // W, W          # lane-contraction factors for L2
    eff = (1.0 / n if direction == Direction.INVERSE else 1.0)
    eff *= (scale if scale is not None else 1.0)
    tabs1 = _col_fft_tables(L1, direction)
    tabs2 = _col_fft_tables(L2, direction, None if eff == 1.0 else eff,
                            factors=(la2, lb2))
    A, P = _rank1_twiddle_np(L1, L2, W, direction)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))
    Pi = jnp.asarray(P.imag.astype(np.float32))

    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = xr.dtype
    C2 = L2 // W
    G1 = L1 // R
    in_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L2, R),
        lambda b, s: (b, 0, jnp.maximum(s - C2, 0)),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_resident_v6_kernel, L1=L1, L2=L2, W=W, R=R,
                          fa1=fa1, fb1=fb1, la2=la2, lb2=lb2, prec=prec),
        grid=(B, C2 + G1),
        in_specs=[in_blk, in_blk] + [const] * 12 + [a_blk, a_blk,
                                                    const, const],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L2, L1), dt),
                   jax.ShapeDtypeStruct((B, L2, L1), dt)),
        scratch_shapes=[
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((C2, L1, W), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (la2 + lb2)) * n * B,
            transcendentals=0,
            bytes_accessed=2 * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1, *tabs2, Ar, Ai, Pr, Pi)
    return yr.reshape(B, n), yi.reshape(B, n)


def fft_split_resident(xr, xi, direction=FORWARD,
                       interpret: bool | None = None,
                       scale: float | None = None,
                       out_rows: int | None = None,
                       layout: str = "v2",
                       prec: str | None = None):
    """Batched FFT on split planes via the one-residency VMEM kernel.

    xr, xi: float32 [..., n], n = 2^15..2^20 pow2. Forward unscaled /
    inverse 1/n (reference convention, radix2_dit.c:115-119);
    natural-order output. `scale` folds an extra output normalization
    into the phase-B tables for free. `out_rows` overrides the strided
    write's chunk width R (multiple of 128 dividing L1): wider R = wider
    HBM write bursts at the cost of bigger double-buffered out blocks.
    `layout="v4"` stores the resident matrix TRANSPOSED during phase A
    (static-sliced transposes that overlap the input DMA) so phase B is
    pure column-FFT + store — the same math, a different placement of
    the unavoidable transpose work (see _resident_v4_kernel).
    `layout="v6"` removes the transposes entirely: phase B runs the
    second FFT in lane-contraction form, so the corner turn rides the
    MXU contraction axes (see _resident_v6_kernel)."""
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
    if layout not in ("v2", "v4", "v6"):
        raise ValueError(
            f"layout must be 'v2', 'v4' or 'v6'; got {layout!r}")
    impl = {"v2": _fft_resident_impl, "v4": _fft_resident_v4_impl,
            "v6": _fft_resident_v6_impl}[layout]
    kw = {}
    if layout in ("v4", "v6") and prec is not None:
        # MXU pass count override (bf16_3x vs bf16_6x); only the v4/v6
        # formulations thread it (the A/B candidates).
        kw["prec"] = prec
    yr, yi = impl(
        xr.reshape(B, n), xi.reshape(B, n),
        direction=Direction(int(direction)), interpret=bool(interpret),
        scale=None if scale is None else float(scale),
        # Resolved OUTSIDE jit (static cache key): a stale entry keyed
        # on the default must not shadow a later FFTLAB_RES_R change.
        R=_out_chunk_rows(L1, out_rows),
        **kw,
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


# ---------------------------------------------------------------------------
# Contiguous-IO variant (v3): the v2 kernel's two HBM edges are both
# strided (input: W-lane column chunks of (L1, L2), 512 B bursts at 4 KB
# stride; output: R-lane column chunks of (L2, L1)). This variant makes
# EVERY HBM access a contiguous block at the cost of two extra in-VMEM
# phases:
#
#   phase 0 (C1 programs)   copy-in: contiguous (R1, L2) row chunks of x
#                           land in VMEM and are lane-split into the
#                           blocked resident matrix (static lane tiles,
#                           dynamic sublane offset — no transpose)
#   phase A (C2 programs)   in-place column FFT + rank-1 twiddle on
#                           Mb[s] (all traffic VMEM<->VMEM)
#   phase B (G1 programs)   assemble (L2, R), length-L2 FFT, store the
#                           result TRANSPOSED back into the same Mb rows
#                           the read just freed (the filter kernel's
#                           mid-phase trick) — after the last g, slot
#                           Mb[c] holds out[cW:(c+1)W, :]^T
#   phase C (C2 programs)   per-tile transposes straight into the out
#                           block: contiguous (W, L1) row chunks of the
#                           natural spectrum
#
# Same 16 B/sample, zero strided bursts. Interpret-tested equal to v2;
# the device A/B (scripts/tpu_resident_ab.py, res_cio) decides which
# formulation the dispatch route serves.
# ---------------------------------------------------------------------------


def _resident_cio_kernel(xr_blk, xi_blk,
                         Far1, Fai1, Fbr1, Fbi1, twr1, twi1,
                         Far2, Fai2, Fbr2, Fbi2, twr2, twi2,
                         ar_blk, ai_blk, Pr, Pi,
                         or_blk, oi_blk,
                         Mbr, Mbi, T2r, T2i,
                         *, L1: int, L2: int, W: int, R: int, R1: int,
                         fa1: int, fb1: int, fa2: int, fb2: int):
    s = pl.program_id(1)
    C1 = L1 // R1
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C1)
    def _copy_in():
        # Lane-split the contiguous row chunk into the blocked matrix:
        # Mb[c][q*R1:(q+1)*R1, :] = x[q-rows, c-lanes]. Static lane
        # tiles, dynamic sublane offset only.
        rows = pl.ds(s * R1, R1)
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Mbr[c, rows, :] = xr_blk[0, :, ls]
            Mbi[c, rows, :] = xi_blk[0, :, ls]

    @pl.when(jnp.logical_and(s >= C1, s < C1 + C2))
    def _phase_a():
        c = s - C1
        tabs1 = (Far1[...], Fai1[...], Fbr1[...], Fbi1[...],
                 twr1[...], twi1[...])
        yr, yi = _col_fft_vmem(Mbr[c], Mbi[c], tabs1, fa1, fb1)
        ar = ar_blk[0]
        ai = ai_blk[0]
        wr = ar * Pr[...] - ai * Pi[...]
        wi = ar * Pi[...] + ai * Pr[...]
        Mbr[c] = yr * wr - yi * wi
        Mbi[c] = yr * wi + yi * wr

    @pl.when(jnp.logical_and(s >= C1 + C2, s < C1 + C2 + G1))
    def _phase_b():
        g = s - C1 - C2
        rs = pl.ds(g * R, R)
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            T2r[ls, :] = jnp.transpose(Mbr[c, rs, :], (1, 0))
            T2i[ls, :] = jnp.transpose(Mbi[c, rs, :], (1, 0))
        tabs2 = (Far2[...], Fai2[...], Fbr2[...], Fbi2[...],
                 twr2[...], twi2[...])
        yr, yi = _col_fft_vmem(T2r[...], T2i[...], tabs2, fa2, fb2)
        # store out[:, k1 chunk]^T back into the rows freed above
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Mbr[c, rs, :] = jnp.transpose(yr[ls, :], (1, 0))
            Mbi[c, rs, :] = jnp.transpose(yi[ls, :], (1, 0))

    @pl.when(s >= C1 + C2 + G1)
    def _phase_c():
        c = s - C1 - C2 - G1
        # out rows [cW, (c+1)W) = Mb[c]^T, tiled transposes straight
        # into the out block (static lane destinations)
        for g in range(G1):
            ls = slice(g * R, (g + 1) * R)
            rs = pl.ds(g * R, R)
            or_blk[0, :, ls] = jnp.transpose(Mbr[c, rs, :], (1, 0))
            oi_blk[0, :, ls] = jnp.transpose(Mbi[c, rs, :], (1, 0))


@functools.partial(
    jax.jit,
    static_argnames=("direction", "interpret", "scale", "R", "R1"),
)
def _fft_resident_cio_impl(xr, xi, *, direction: Direction,
                           interpret: bool, scale=None,
                           R: int | None = None, R1: int | None = None):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    if R is None:
        R = min(LANES, L1)
    if R1 is None:
        R1 = min(LANES, L1)
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)
    eff = (1.0 / n if direction == Direction.INVERSE else 1.0)
    eff *= (scale if scale is not None else 1.0)
    tabs1 = _col_fft_tables(L1, direction)
    tabs2 = _col_fft_tables(L2, direction, None if eff == 1.0 else eff)
    A, P = _rank1_twiddle_np(L1, L2, W, direction)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))
    Pi = jnp.asarray(P.imag.astype(np.float32))

    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = xr.dtype
    C1 = L1 // R1
    C2 = L2 // W
    G1 = L1 // R
    S = C1 + C2 + G1 + C2
    # Contiguous edges, clamped outside their phase: the in block parks
    # at its last chunk after phase 0; the out block parks at 0 until
    # phase C writes it (flushed when the index advances, v2-proven).
    in_blk = pl.BlockSpec(
        (1, R1, L2),
        lambda b, s: (b, jnp.minimum(s, C1 - 1), 0),
        memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.clip(s - C1, 0, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, W, L1),
        lambda b, s: (b, jnp.maximum(s - (C1 + C2 + G1), 0), 0),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_resident_cio_kernel, L1=L1, L2=L2, W=W, R=R,
                          R1=R1, fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2),
        grid=(B, S),
        in_specs=[in_blk, in_blk] + [const] * 12 + [a_blk, a_blk,
                                                    const, const],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L2, L1), dt),
                   jax.ShapeDtypeStruct((B, L2, L1), dt)),
        scratch_shapes=[
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((L2, R), dt),
            pltpu.VMEM((L2, R), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=2 * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1, *tabs2, Ar, Ai, Pr, Pi)
    return yr.reshape(B, n), yi.reshape(B, n)


def fft_split_resident_cio(xr, xi, direction=FORWARD,
                           interpret: bool | None = None,
                           scale: float | None = None,
                           out_rows: int | None = None,
                           in_rows: int | None = None):
    """One-residency FFT with ALL-CONTIGUOUS HBM access (v3): same
    contract as `fft_split_resident`, plus `in_rows` (copy-in row-chunk
    height R1, multiple of 8 dividing L1)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_resident(n):
        raise ValueError(
            f"fft_split_resident_cio supports pow2 n in "
            f"[{MIN_N}, {MAX_N}]; got {n}"
        )
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    L1, _ = _split_sides(n)
    R1 = min(LANES, L1) if in_rows is None else int(in_rows)
    if R1 % 8 or L1 % R1:
        raise ValueError(
            f"in_rows={R1} must be a multiple of 8 dividing L1={L1}"
        )
    yr, yi = _fft_resident_cio_impl(
        xr.reshape(B, n), xi.reshape(B, n),
        direction=Direction(int(direction)), interpret=bool(interpret),
        scale=None if scale is None else float(scale),
        R=_out_chunk_rows(L1, out_rows), R1=R1,
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


def _resident_filter_kernel(xr_blk, xi_blk,
                            F1r, F1i, G1r, G1i, T1r, T1i,      # fwd L1
                            F2r, F2i, G2r, G2i, T2r_, T2i_,    # fwd L2
                            I2ar, I2ai, I2br, I2bi, I2tr, I2ti,  # inv L2
                            I1ar, I1ai, I1br, I1bi, I1tr, I1ti,  # inv L1 (1/n)
                            af_blk_r, af_blk_i, Pfr, Pfi,      # fwd rank-1
                            ai_blk_r, ai_blk_i, Ipr, Ipi,      # inv rank-1
                            hr_blk, hi_blk,
                            or_blk, oi_blk,
                            Mbr, Mbi, Tr, Ti,
                            *, L1: int, L2: int, W: int, R: int,
                            fa1: int, fb1: int, fa2: int, fb2: int):
    """Grid (B, C2 + G1 + C2), s innermost, all I/O BlockSpec-delivered:

      s < C2          fwd phase A: column FFT of the x chunk + fwd
                      rank-1 twiddle -> Mb[s]
      C2 <= s < C2+G1 mid chunk g = s - C2: assemble the (L2, R)
                      spectrum-column matrix from Mb (per-tile
                      transposes), fwd length-L2 FFT, multiply the
                      BlockSpec-delivered H chunk, inverse length-L2 FFT
                      + inverse rank-1 twiddle, store the pieces
                      transposed back into the SAME Mb rows (freed by
                      the read at the top of the iteration)
      s >= C2+G1      inv phase B chunk q: with the mid store's layout,
                      slot Mb[q] IS the (L1, W) column matrix the
                      inverse's last FFT wants — a whole-slot read at a
                      dynamic leading index, no lane slicing — then the
                      length-L1 inverse FFT (1/n folded) -> out block.

    Clamped index maps keep every block parked outside its phase, so the
    HBM traffic is one residency + one streamed read of H."""
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        tabs1 = (F1r[...], F1i[...], G1r[...], G1i[...],
                 T1r[...], T1i[...])
        yr, yi = _col_fft_vmem(xr_blk[0], xi_blk[0], tabs1, fa1, fb1)
        ar = af_blk_r[0]
        ai = af_blk_i[0]
        wr = ar * Pfr[...] - ai * Pfi[...]
        wi = ar * Pfi[...] + ai * Pfr[...]
        Mbr[s] = yr * wr - yi * wi
        Mbi[s] = yr * wi + yi * wr

    @pl.when(jnp.logical_and(s >= C2, s < C2 + G1))
    def _mid():
        g = s - C2
        rs = pl.ds(g * R, R)
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Tr[ls, :] = jnp.transpose(Mbr[c, rs, :], (1, 0))
            Ti[ls, :] = jnp.transpose(Mbi[c, rs, :], (1, 0))
        tabs2f = (F2r[...], F2i[...], G2r[...], G2i[...],
                  T2r_[...], T2i_[...])
        yr, yi = _col_fft_vmem(Tr[...], Ti[...], tabs2f, fa2, fb2)
        hr = hr_blk[0]
        hi = hi_blk[0]
        zr = yr * hr - yi * hi
        zi = yr * hi + yi * hr
        tabs2i = (I2ar[...], I2ai[...], I2br[...], I2bi[...],
                  I2tr[...], I2ti[...])
        mr2, mi2 = _col_fft_vmem(zr, zi, tabs2i, fa2, fb2)
        iar = ai_blk_r[0]          # (L2, 1)
        iai = ai_blk_i[0]
        iwr = iar * Ipr[...] - iai * Ipi[...]
        iwi = iar * Ipi[...] + iai * Ipr[...]
        vr = mr2 * iwr - mi2 * iwi   # (L2, R) = M'[:, g chunk]
        vi = mr2 * iwi + mi2 * iwr
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Mbr[c, rs, :] = jnp.transpose(vr[ls, :], (1, 0))
            Mbi[c, rs, :] = jnp.transpose(vi[ls, :], (1, 0))

    @pl.when(s >= C2 + G1)
    def _phase_b():
        q = s - C2 - G1
        tabs1i = (I1ar[...], I1ai[...], I1br[...], I1bi[...],
                  I1tr[...], I1ti[...])
        # Mb[q][j, t] = M'[q*W + t, j]: already the (L1, W) column
        # matrix of the inverse's final length-L1 FFT
        yr, yi = _col_fft_vmem(Mbr[q], Mbi[q], tabs1i, fa1, fb1)
        or_blk[0] = yr
        oi_blk[0] = yi


@functools.partial(
    jax.jit, static_argnames=("interpret",),
)
def _filter_resident_impl(xr, xi, h2r, h2i, *, interpret: bool):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    R = min(LANES, L1)
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

    dt = xr.dtype
    C2 = L2 // W
    G1 = L1 // R
    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    af_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    mid_idx = lambda s: jnp.clip(s - C2, 0, G1 - 1)
    ai_blk = pl.BlockSpec(
        (1, L2, 1),
        lambda b, s: (mid_idx(s), 0, 0),
        memory_space=pltpu.VMEM)
    h_blk = pl.BlockSpec(
        (1, L2, R),
        lambda b, s: (0, 0, mid_idx(s)),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.maximum(s - C2 - G1, 0)),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_resident_filter_kernel, L1=L1, L2=L2, W=W,
                          R=R, fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2),
        grid=(B, C2 + G1 + C2),
        in_specs=[in_blk, in_blk] + [const] * 24
                 + [af_blk, af_blk, const, const]
                 + [ai_blk, ai_blk, const, const]
                 + [h_blk, h_blk],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L1, L2), dt),
                   jax.ShapeDtypeStruct((B, L1, L2), dt)),
        scratch_shapes=[
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((L2, R), dt),
            pltpu.VMEM((L2, R), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=(2 * 2 + 1) * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1f, *tabs2f, *tabs2i, *tabs1i,
      c32(Af.real), c32(Af.imag), c32(Pf.real), c32(Pf.imag),
      c32(Ai_.real), c32(Ai_.imag), c32(Pi_.real), c32(Pi_.imag),
      h2r, h2i)
    # (B, L1, L2) flattens to [b, j1*L2 + j2] = natural time order
    return yr.reshape(B, n), yi.reshape(B, n)


def _filter_cio_kernel(xr_blk, xi_blk,
                       F1r, F1i, G1r, G1i, T1r, T1i,
                       F2r, F2i, G2r, G2i, T2r_, T2i_,
                       I2ar, I2ai, I2br, I2bi, I2tr, I2ti,
                       I1ar, I1ai, I1br, I1bi, I1tr, I1ti,
                       af_blk_r, af_blk_i, Pfr, Pfi,
                       ai_blk_r, ai_blk_i, Ipr, Ipi,
                       hr_blk, hi_blk,
                       or_blk, oi_blk,
                       Mbr, Mbi, Tr, Ti,
                       *, L1: int, L2: int, W: int, R: int, R1: int,
                       fa1: int, fb1: int, fa2: int, fb2: int):
    """Contiguous-IO resident filter: phases
    copy-in (C1) -> fwd A in place (C2) -> mid (G1, identical to v2) ->
    inv B in place (C2) -> contiguous write-out (C1). The H chunks
    arrive PRE-PERMUTED as (G1, L2, R) so their BlockSpec reads are
    contiguous too — every HBM edge of the whole sandwich is a
    contiguous block."""
    s = pl.program_id(1)
    C1 = L1 // R1
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C1)
    def _copy_in():
        rows = pl.ds(s * R1, R1)
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Mbr[c, rows, :] = xr_blk[0, :, ls]
            Mbi[c, rows, :] = xi_blk[0, :, ls]

    @pl.when(jnp.logical_and(s >= C1, s < C1 + C2))
    def _phase_a():
        c = s - C1
        tabs1 = (F1r[...], F1i[...], G1r[...], G1i[...],
                 T1r[...], T1i[...])
        yr, yi = _col_fft_vmem(Mbr[c], Mbi[c], tabs1, fa1, fb1)
        ar = af_blk_r[0]
        ai = af_blk_i[0]
        wr = ar * Pfr[...] - ai * Pfi[...]
        wi = ar * Pfi[...] + ai * Pfr[...]
        Mbr[c] = yr * wr - yi * wi
        Mbi[c] = yr * wi + yi * wr

    @pl.when(jnp.logical_and(s >= C1 + C2, s < C1 + C2 + G1))
    def _mid():
        g = s - C1 - C2
        rs = pl.ds(g * R, R)
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Tr[ls, :] = jnp.transpose(Mbr[c, rs, :], (1, 0))
            Ti[ls, :] = jnp.transpose(Mbi[c, rs, :], (1, 0))
        tabs2f = (F2r[...], F2i[...], G2r[...], G2i[...],
                  T2r_[...], T2i_[...])
        yr, yi = _col_fft_vmem(Tr[...], Ti[...], tabs2f, fa2, fb2)
        hr = hr_blk[0]
        hi = hi_blk[0]
        zr = yr * hr - yi * hi
        zi = yr * hi + yi * hr
        tabs2i = (I2ar[...], I2ai[...], I2br[...], I2bi[...],
                  I2tr[...], I2ti[...])
        mr2, mi2 = _col_fft_vmem(zr, zi, tabs2i, fa2, fb2)
        iar = ai_blk_r[0]
        iai = ai_blk_i[0]
        iwr = iar * Ipr[...] - iai * Ipi[...]
        iwi = iar * Ipi[...] + iai * Ipr[...]
        vr = mr2 * iwr - mi2 * iwi
        vi = mr2 * iwi + mi2 * iwr
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Mbr[c, rs, :] = jnp.transpose(vr[ls, :], (1, 0))
            Mbi[c, rs, :] = jnp.transpose(vi[ls, :], (1, 0))

    @pl.when(jnp.logical_and(s >= C1 + C2 + G1, s < C1 + 2 * C2 + G1))
    def _phase_b():
        q = s - C1 - C2 - G1
        tabs1i = (I1ar[...], I1ai[...], I1br[...], I1bi[...],
                  I1tr[...], I1ti[...])
        yr, yi = _col_fft_vmem(Mbr[q], Mbi[q], tabs1i, fa1, fb1)
        Mbr[q] = yr        # in place: out[:, j2 chunk q]
        Mbi[q] = yi

    @pl.when(s >= C1 + 2 * C2 + G1)
    def _write_out():
        p = s - C1 - 2 * C2 - G1
        rows = pl.ds(p * R1, R1)
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            or_blk[0, :, ls] = Mbr[c, rows, :]
            oi_blk[0, :, ls] = Mbi[c, rows, :]


@functools.partial(
    jax.jit, static_argnames=("interpret",),
)
def _filter_resident_cio_impl(xr, xi, h3r, h3i, *, interpret: bool):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    R = min(LANES, L1)
    R1 = min(LANES, L1)
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)
    fwd = Direction.FORWARD
    inv = Direction.INVERSE
    tabs1f = _col_fft_tables(L1, fwd)
    tabs2f = _col_fft_tables(L2, fwd)
    tabs2i = _col_fft_tables(L2, inv)
    tabs1i = _col_fft_tables(L1, inv, 1.0 / n)
    Af, Pf = _rank1_twiddle_np(L1, L2, W, fwd)
    Ai_, Pi_ = _rank1_twiddle_np(L2, L1, R, inv)
    c32 = lambda a: jnp.asarray(np.ascontiguousarray(a).astype(np.float32))

    dt = xr.dtype
    C1 = L1 // R1
    C2 = L2 // W
    G1 = L1 // R
    S = C1 + C2 + G1 + C2 + C1
    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_blk = pl.BlockSpec(
        (1, R1, L2),
        lambda b, s: (b, jnp.minimum(s, C1 - 1), 0),
        memory_space=pltpu.VMEM)
    af_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.clip(s - C1, 0, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    mid_idx = lambda s: jnp.clip(s - C1 - C2, 0, G1 - 1)
    ai_blk = pl.BlockSpec(
        (1, L2, 1),
        lambda b, s: (mid_idx(s), 0, 0),
        memory_space=pltpu.VMEM)
    h_blk = pl.BlockSpec(
        (1, L2, R),
        lambda b, s: (mid_idx(s), 0, 0),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, R1, L2),
        lambda b, s: (b, jnp.maximum(s - (C1 + 2 * C2 + G1), 0), 0),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_filter_cio_kernel, L1=L1, L2=L2, W=W,
                          R=R, R1=R1, fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2),
        grid=(B, S),
        in_specs=[in_blk, in_blk] + [const] * 24
                 + [af_blk, af_blk, const, const]
                 + [ai_blk, ai_blk, const, const]
                 + [h_blk, h_blk],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L1, L2), dt),
                   jax.ShapeDtypeStruct((B, L1, L2), dt)),
        scratch_shapes=[
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((L2, R), dt),
            pltpu.VMEM((L2, R), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=(2 * 2 + 1) * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1f, *tabs2f, *tabs2i, *tabs1i,
      c32(Af.real), c32(Af.imag), c32(Pf.real), c32(Pf.imag),
      c32(Ai_.real), c32(Ai_.imag), c32(Pi_.real), c32(Pi_.imag),
      h3r, h3i)
    return yr.reshape(B, n), yi.reshape(B, n)


def spectral_filter_resident_cio(xr, xi, hr, hi,
                                 interpret: bool | None = None):
    """`spectral_filter_resident` with EVERY HBM edge contiguous (the
    v3 formulation): copy-in/write-out phases run in VMEM and the H
    chunks are pre-permuted at trace time to (G1, L2, R) so their
    streaming reads are contiguous blocks too. Identical numerics."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_resident(n):
        raise ValueError(
            f"spectral_filter_resident_cio supports pow2 n in "
            f"[{MIN_N}, {MAX_N}]; got {n}"
        )
    L1, L2 = _split_sides(n)
    R = min(LANES, L1)
    G1 = L1 // R
    # natural spectrum matrix (L2, L1), chunked by k1 into (G1, L2, R):
    # chunk g is H2[:, g*R:(g+1)*R], stored contiguous per chunk
    h2r = jnp.asarray(hr, dtype=xr.dtype).reshape(L2, G1, R)
    h2i = jnp.asarray(hi, dtype=xr.dtype).reshape(L2, G1, R)
    h3r = jnp.transpose(h2r, (1, 0, 2))
    h3i = jnp.transpose(h2i, (1, 0, 2))
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    yr, yi = _filter_resident_cio_impl(
        xr.reshape(B, n), xi.reshape(B, n), h3r, h3i,
        interpret=bool(interpret),
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


# ---------------------------------------------------------------------------
# v5 fused filter: the TRANSPOSE-FREE sandwich. v2's mid phase does
# 2*C2 dynamic-sublane tile transposes per chunk (C2 to assemble the
# spectrum columns, C2 to store the inverse intermediate) on the same
# critical path as its two FFTs and the streamed H chunk — the exact
# pattern the v2->v4 plain-FFT arc measured as the loss. Here BOTH
# corner turns ride MXU contraction axes instead
# (fourstep_vmem._col_fft_lanes):
#
#   phase A   column FFT + fwd rank-1 twiddle -> Mb[s] (static store)
#   mid g     fwd L2 FFT DIRECTLY on the (C2, R, W) slice
#             Mb[:, gR:(g+1)R, :] in lane-contraction form -> natural
#             (L2, R) spectrum columns -> ⊙H chunk -> standard inverse
#             L2 FFT + inverse rank-1 twiddle -> v, stored back
#             UNTRANSPOSED into the same rows (square R = W tiles,
#             static source slices, dynamic sublane destination)
#   phase B   slot Mb[q] reshaped (G1, R, W) IS the final inverse
#             length-L1 FFT's operand in lane-contraction form
#             (u = g*R + b: slots carry the sublane digit, lanes the
#             minor digit) -> (L1, W) natural time order -> out block
#
# Zero in-VMEM transposes, one scratch matrix (v2 also carries the
# (L2, R) assembly scratch), same one-residency traffic: 24 B/sample
# including the streamed H. Flop cost rises ~1.5x (the lane form's
# unbalanced factors), but the kernel is bandwidth-bound and the MXU
# has the headroom — the r3 device A/B decides, like v4 before it.
# Reference anchor: fft_filtering.c:111-132 as one VMEM residency.
# ---------------------------------------------------------------------------


def _filter_v5_kernel(xr_blk, xi_blk,
                      F1r, F1i, G1r, G1i, T1r, T1i,          # fwd L1
                      L2ar, L2ai, L2br, L2bi, L2tr, L2ti,    # fwd L2 (lane)
                      I2ar, I2ai, I2br, I2bi, I2tr, I2ti,    # inv L2
                      J1ar, J1ai, J1br, J1bi, J1tr, J1ti,    # inv L1 (lane, 1/n)
                      af_blk_r, af_blk_i, Pfr, Pfi,          # fwd rank-1
                      ai_blk_r, ai_blk_i, Ipr, Ipi,          # inv rank-1
                      hr_blk, hi_blk,
                      or_blk, oi_blk,
                      Mbr, Mbi,
                      *, L1: int, L2: int, W: int, R: int,
                      fa1: int, fb1: int, fa2: int, fb2: int,
                      la2: int, lb2: int, ja1: int, jb1: int,
                      prec: str | None = None):
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        tabs1 = (F1r[...], F1i[...], G1r[...], G1i[...],
                 T1r[...], T1i[...])
        yr, yi = _col_fft_vmem(xr_blk[0], xi_blk[0], tabs1, fa1, fb1)
        ar = af_blk_r[0]
        ai = af_blk_i[0]
        wr = ar * Pfr[...] - ai * Pfi[...]
        wi = ar * Pfi[...] + ai * Pfr[...]
        Mbr[s] = yr * wr - yi * wi
        Mbi[s] = yr * wi + yi * wr

    @pl.when(jnp.logical_and(s >= C2, s < C2 + G1))
    def _mid():
        g = s - C2
        rs = pl.ds(g * R, R)
        tabs2f = (L2ar[...], L2ai[...], L2br[...], L2bi[...],
                  L2tr[...], L2ti[...])
        yr, yi = _col_fft_lanes(Mbr[:, rs, :], Mbi[:, rs, :],
                                tabs2f, la2, lb2, prec)
        hr = hr_blk[0]
        hi = hi_blk[0]
        zr = yr * hr - yi * hi
        zi = yr * hi + yi * hr
        tabs2i = (I2ar[...], I2ai[...], I2br[...], I2bi[...],
                  I2tr[...], I2ti[...])
        # the inverse L2 FFT's input is already sublane-natural, so it
        # keeps the cheaper balanced factors
        mr2, mi2 = _col_fft_vmem(zr, zi, tabs2i, fa2, fb2, prec)
        iar = ai_blk_r[0]
        iai = ai_blk_i[0]
        iwr = iar * Ipr[...] - iai * Ipi[...]
        iwi = iar * Ipi[...] + iai * Ipr[...]
        vr = mr2 * iwr - mi2 * iwi      # (L2, R) = M'[:, g chunk]
        vi = mr2 * iwi + mi2 * iwr
        # untransposed square-tile store into the rows the read freed:
        # Mb[c, gR + a, b] = M'[cW + a, gR + b]
        for c in range(C2):
            ls = slice(c * W, (c + 1) * W)
            Mbr[c, rs, :] = vr[ls, :]
            Mbi[c, rs, :] = vi[ls, :]

    @pl.when(s >= C2 + G1)
    def _phase_b():
        q = s - C2 - G1
        tabs1i = (J1ar[...], J1ai[...], J1br[...], J1bi[...],
                  J1tr[...], J1ti[...])
        # Mb[q].reshape(G1, R, W)[g, t, b] = M'[qW + t, gR + b]: the
        # final inverse FFT over u = g*R + b in lane-contraction form
        xg = Mbr[q].reshape(G1, R, W)
        yg = Mbi[q].reshape(G1, R, W)
        yr, yi = _col_fft_lanes(xg, yg, tabs1i, ja1, jb1, prec)
        or_blk[0] = yr
        oi_blk[0] = yi


@functools.partial(
    jax.jit, static_argnames=("interpret", "prec"),
)
def _filter_resident_v5_impl(xr, xi, h2r, h2i, *, interpret: bool,
                             prec: str | None = None):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    R = min(LANES, L1)
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)   # balanced: the inverse L2 FFT
    la2, lb2 = L2 // W, W           # lane form: the forward L2 FFT
    ja1, jb1 = L1 // R, R           # lane form: the final inverse L1 FFT
    fwd = Direction.FORWARD
    inv = Direction.INVERSE
    tabs1f = _col_fft_tables(L1, fwd)
    tabs2f = _col_fft_tables(L2, fwd, factors=(la2, lb2))
    tabs2i = _col_fft_tables(L2, inv)
    tabs1i = _col_fft_tables(L1, inv, 1.0 / n, factors=(ja1, jb1))
    Af, Pf = _rank1_twiddle_np(L1, L2, W, fwd)
    Ai_, Pi_ = _rank1_twiddle_np(L2, L1, R, inv)
    c32 = lambda a: jnp.asarray(np.ascontiguousarray(a).astype(np.float32))

    dt = xr.dtype
    C2 = L2 // W
    G1 = L1 // R
    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    af_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    mid_idx = lambda s: jnp.clip(s - C2, 0, G1 - 1)
    ai_blk = pl.BlockSpec(
        (1, L2, 1),
        lambda b, s: (mid_idx(s), 0, 0),
        memory_space=pltpu.VMEM)
    h_blk = pl.BlockSpec(
        (1, L2, R),
        lambda b, s: (0, 0, mid_idx(s)),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.maximum(s - C2 - G1, 0)),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_filter_v5_kernel, L1=L1, L2=L2, W=W,
                          R=R, fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2,
                          la2=la2, lb2=lb2, ja1=ja1, jb1=jb1,
                          prec=prec),
        grid=(B, C2 + G1 + C2),
        in_specs=[in_blk, in_blk] + [const] * 24
                 + [af_blk, af_blk, const, const]
                 + [ai_blk, ai_blk, const, const]
                 + [h_blk, h_blk],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L1, L2), dt),
                   jax.ShapeDtypeStruct((B, L1, L2), dt)),
        scratch_shapes=[
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((C2, L1, W), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ((fa1 + fb1) + (la2 + lb2) + (fa2 + fb2)
                       + (ja1 + jb1)) * n * B,
            transcendentals=0,
            bytes_accessed=(2 * 2 + 1) * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1f, *tabs2f, *tabs2i, *tabs1i,
      c32(Af.real), c32(Af.imag), c32(Pf.real), c32(Pf.imag),
      c32(Ai_.real), c32(Ai_.imag), c32(Pi_.real), c32(Pi_.imag),
      h2r, h2i)
    return yr.reshape(B, n), yi.reshape(B, n)


def spectral_filter_resident_v5(xr, xi, hr, hi,
                                interpret: bool | None = None,
                                prec: str | None = None):
    """The fused FFT -> H -> IFFT sandwich with ZERO in-VMEM
    transposes (the v5 lane-contraction formulation — see the design
    block above). Same contract as `spectral_filter_resident`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_resident(n):
        raise ValueError(
            f"spectral_filter_resident_v5 supports pow2 n in "
            f"[{MIN_N}, {MAX_N}]; got {n}"
        )
    L1, L2 = _split_sides(n)
    # the untransposed mid store needs square (R, W) tiles; R = W = 128
    # holds for every supported n (L1 >= 128 from MIN_N = 2^15)
    assert min(LANES, L1) == LANES, (n, L1)
    h2r = jnp.asarray(hr, dtype=xr.dtype).reshape(1, L2, L1)
    h2i = jnp.asarray(hi, dtype=xr.dtype).reshape(1, L2, L1)
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    yr, yi = _filter_resident_v5_impl(
        xr.reshape(B, n), xi.reshape(B, n), h2r, h2i,
        interpret=bool(interpret), prec=prec,
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


def _filter_v7_kernel(xr_blk, xi_blk,
                      F1r, F1i, G1r, G1i, T1r, T1i,      # fwd L1
                      F2r, F2i, G2r, G2i, T2r_, T2i_,    # fwd L2
                      I2ar, I2ai, I2br, I2bi, I2tr, I2ti,  # inv L2
                      I1ar, I1ai, I1br, I1bi, I1tr, I1ti,  # inv L1 (1/n)
                      af_blk_r, af_blk_i, Pfr, Pfi,      # fwd rank-1
                      ai_blk_r, ai_blk_i, Ipr, Ipi,      # inv rank-1
                      hr_blk, hi_blk,
                      or_blk, oi_blk,
                      M4r, M4i, Tr, Ti,
                      *, L1: int, L2: int, W: int, R: int,
                      fa1: int, fb1: int, fa2: int, fb2: int,
                      prec=None):
    """v7 = the filter sandwich with v4 TRANSPOSE PLACEMENT: v1's mid
    step does BOTH corner turns (assembly from Mb with a dynamic
    sublane SOURCE, then the store back with a dynamic sublane DEST),
    stacked between its four FFT passes on the same critical path.
    Here the turns are split across the DMA-overlapped phases:

      s < C2          fwd phase A: column FFT + fwd rank-1 twiddle,
                      then the fwd corner turn as v4 does it —
                      transpose-store into per-g slots of the
                      (G1, L2, R) scratch (static transpose source;
                      only the store dest keeps a dynamic sublane
                      offset s*W), overlapping the IN-block stream.
      C2 <= s < C2+G1 mid g: PURE compute — whole-slot read M4[g],
                      fwd L2 FFT, x H chunk, inv L2 FFT, inv rank-1
                      twiddle, whole-slot store back IN PLACE.
      s >= C2+G1      inv phase B chunk q: the inverse corner turn
                      (G1 per-slot transposes, dynamic sublane source
                      q*W) assembles the (L1, W) column matrix,
                      inverse L1 FFT (1/n folded) -> out block,
                      overlapping the OUT-block stream.

    One resident matrix (same VMEM budget as v1) + a (L1, W) assembly
    scratch. HBM traffic: one residency + one streamed read of H."""
    s = pl.program_id(1)
    C2 = L2 // W
    G1 = L1 // R

    @pl.when(s < C2)
    def _phase_a():
        tabs1 = (F1r[...], F1i[...], G1r[...], G1i[...],
                 T1r[...], T1i[...])
        yr, yi = _col_fft_vmem(xr_blk[0], xi_blk[0], tabs1, fa1, fb1,
                               prec)
        ar = af_blk_r[0]
        ai = af_blk_i[0]
        wr = ar * Pfr[...] - ai * Pfi[...]
        wi = ar * Pfi[...] + ai * Pfr[...]
        tr = yr * wr - yi * wi
        ti = yr * wi + yi * wr
        for g in range(G1):
            rs = slice(g * R, (g + 1) * R)          # static
            ls = pl.ds(s * W, W)                    # dynamic sublane
            M4r[g, ls, :] = jnp.transpose(tr[rs, :], (1, 0))
            M4i[g, ls, :] = jnp.transpose(ti[rs, :], (1, 0))

    @pl.when(jnp.logical_and(s >= C2, s < C2 + G1))
    def _mid():
        g = s - C2
        tabs2f = (F2r[...], F2i[...], G2r[...], G2i[...],
                  T2r_[...], T2i_[...])
        yr, yi = _col_fft_vmem(M4r[g], M4i[g], tabs2f, fa2, fb2, prec)
        hr = hr_blk[0]
        hi = hi_blk[0]
        zr = yr * hr - yi * hi
        zi = yr * hi + yi * hr
        tabs2i = (I2ar[...], I2ai[...], I2br[...], I2bi[...],
                  I2tr[...], I2ti[...])
        mr2, mi2 = _col_fft_vmem(zr, zi, tabs2i, fa2, fb2, prec)
        iar = ai_blk_r[0]          # (L2, 1)
        iai = ai_blk_i[0]
        iwr = iar * Ipr[...] - iai * Ipi[...]
        iwi = iar * Ipi[...] + iai * Ipr[...]
        M4r[g] = mr2 * iwr - mi2 * iwi
        M4i[g] = mr2 * iwi + mi2 * iwr

    @pl.when(s >= C2 + G1)
    def _phase_b():
        q = s - C2 - G1
        qs = pl.ds(q * W, W)                        # dynamic sublane
        for g in range(G1):
            rs = slice(g * R, (g + 1) * R)          # static dest
            Tr[rs, :] = jnp.transpose(M4r[g, qs, :], (1, 0))
            Ti[rs, :] = jnp.transpose(M4i[g, qs, :], (1, 0))
        tabs1i = (I1ar[...], I1ai[...], I1br[...], I1bi[...],
                  I1tr[...], I1ti[...])
        yr, yi = _col_fft_vmem(Tr[...], Ti[...], tabs1i, fa1, fb1, prec)
        or_blk[0] = yr
        oi_blk[0] = yi


@functools.partial(
    jax.jit, static_argnames=("interpret", "prec"),
)
def _filter_resident_v7_impl(xr, xi, h2r, h2i, *, interpret: bool,
                             prec: str | None = None):
    B, n = xr.shape
    L1, L2 = _split_sides(n)
    W = LANES
    R = min(LANES, L1)
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

    dt = xr.dtype
    C2 = L2 // W
    G1 = L1 // R
    x3r = xr.reshape(B, L1, L2)
    x3i = xi.reshape(B, L1, L2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.minimum(s, C2 - 1)),
        memory_space=pltpu.VMEM)
    af_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    mid_idx = lambda s: jnp.clip(s - C2, 0, G1 - 1)
    ai_blk = pl.BlockSpec(
        (1, L2, 1),
        lambda b, s: (mid_idx(s), 0, 0),
        memory_space=pltpu.VMEM)
    h_blk = pl.BlockSpec(
        (1, L2, R),
        lambda b, s: (0, 0, mid_idx(s)),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec(
        (1, L1, W),
        lambda b, s: (b, 0, jnp.maximum(s - C2 - G1, 0)),
        memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_filter_v7_kernel, L1=L1, L2=L2, W=W,
                          R=R, fa1=fa1, fb1=fb1, fa2=fa2, fb2=fb2,
                          prec=prec),
        grid=(B, C2 + G1 + C2),
        in_specs=[in_blk, in_blk] + [const] * 24
                 + [af_blk, af_blk, const, const]
                 + [ai_blk, ai_blk, const, const]
                 + [h_blk, h_blk],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((B, L1, L2), dt),
                   jax.ShapeDtypeStruct((B, L1, L2), dt)),
        scratch_shapes=[
            pltpu.VMEM((G1, L2, R), dt),   # resident matrix (v4 layout)
            pltpu.VMEM((G1, L2, R), dt),
            pltpu.VMEM((L1, W), dt),       # phase-B assembly
            pltpu.VMEM((L1, W), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * ((fa1 + fb1) + (fa2 + fb2)) * n * B,
            transcendentals=0,
            bytes_accessed=(2 * 2 + 1) * 2 * 4 * n * B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            **_dimsem(),
        ),
        interpret=interpret,
    )(x3r, x3i, *tabs1f, *tabs2f, *tabs2i, *tabs1i,
      c32(Af.real), c32(Af.imag), c32(Pf.real), c32(Pf.imag),
      c32(Ai_.real), c32(Ai_.imag), c32(Pi_.real), c32(Pi_.imag),
      h2r, h2i)
    # (B, L1, L2) flattens to [b, j1*L2 + j2] = natural time order
    return yr.reshape(B, n), yi.reshape(B, n)


def spectral_filter_resident_v7(xr, xi, hr, hi,
                                interpret: bool | None = None,
                                prec: str | None = None):
    """The fused FFT -> H -> IFFT sandwich with v4 transpose placement
    (corner turns ride the DMA-overlapped phases; the mid step is pure
    compute — see _filter_v7_kernel). Same contract as
    `spectral_filter_resident`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_resident(n):
        raise ValueError(
            f"spectral_filter_resident_v7 supports pow2 n in "
            f"[{MIN_N}, {MAX_N}]; got {n}"
        )
    L1, L2 = _split_sides(n)
    h2r = jnp.asarray(hr, dtype=xr.dtype).reshape(1, L2, L1)
    h2i = jnp.asarray(hi, dtype=xr.dtype).reshape(1, L2, L1)
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    yr, yi = _filter_resident_v7_impl(
        xr.reshape(B, n), xi.reshape(B, n), h2r, h2i,
        interpret=bool(interpret), prec=prec,
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


def spectral_filter_resident(xr, xi, hr, hi,
                             interpret: bool | None = None):
    """ifft(fft(x) * H) on split planes in ONE kernel and ONE HBM
    residency of the signal (n = 2^15..2^20; H streams per chunk
    through a BlockSpec, +8 B/sample). hr, hi: length-n frequency
    response, natural bin order. Matches
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
    # response as the natural spectrum matrix (1, L2, L1): the kernel
    # consumes its (1, L2, R) column chunks via BlockSpec
    h2r = jnp.asarray(hr, dtype=xr.dtype).reshape(1, L2, L1)
    h2i = jnp.asarray(hi, dtype=xr.dtype).reshape(1, L2, L1)
    batch = xr.shape[:-1]
    B = 1
    for d in batch:
        B *= int(d)
    yr, yi = _filter_resident_impl(
        xr.reshape(B, n), xi.reshape(B, n), h2r, h2i,
        interpret=bool(interpret),
    )
    return yr.reshape(*batch, n), yi.reshape(*batch, n)
