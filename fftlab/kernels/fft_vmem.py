"""Single-VMEM-residency batched FFT kernels (Pallas/Mosaic).

Each grid program transforms one batch row of length n = m*128
(8 <= m <= 128, i.e. n in [1024, 16384] — the DSP hot-path sizes:
STFT frames, overlap-save blocks, filter sandwiches) entirely in VMEM:

    view x as B[j2, j1] (m, 128), j = j1 + 128*j2
    C  = F_m @ B            # column FFTs over j2 — MXU (m,m)@(m,128)
    C *= W_n^{j1*k2}        # inter-stage twiddle — VPU
    D  = C @ F_128^T        # row FFTs over j1 — MXU (m,128)@(128,128)
    out = D^T               # (128, m); flattens to natural order since
                            # k = k2 + m*k1 == row-major index of D^T

All data is split re/im float32 (TPU has no complex registers); each
complex matmul is 4 real MXU dots at HIGHEST precision. The fused filter
kernel continues in the same residency: multiply by H (matrix form),
then the inverse four-step (conjugated tables, transposed view), 1/n.

One HBM round trip total — vs one per stage (plus the digit-reversal
transpose) on the XLA einsum path. The reference's analog of this fusion
level is the (empty) custom butterfly_kernel TODO at fft_cuda.cu:264-266.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.twiddle import dft_matrix_np, stage_twiddle_np
from fftlab.core.types import Direction, FORWARD, is_power_of_two

N1 = 128  # lane-dimension radix: one MXU tile wide

_P = jax.lax.Precision.HIGHEST


def supported_size(n: int) -> bool:
    """n = m*128 with 8 <= m <= 128 and m a power of two."""
    if n % N1:
        return False
    m = n // N1
    return 8 <= m <= 128 and is_power_of_two(m)


def _cdot(ar, ai, br, bi):
    """(ar+i*ai) @ (br+i*bi) as 4 real MXU dots."""
    rr = jnp.dot(ar, br, precision=_P) - jnp.dot(ai, bi, precision=_P)
    ri = jnp.dot(ar, bi, precision=_P) + jnp.dot(ai, br, precision=_P)
    return rr, ri


def _tables(n: int, direction: Direction, dtype=np.float32,
            scale: float | None = None):
    """Host-side constant tables for the kernel: F_m, F_128, W_n^{j1*k2}.

    `scale` folds an output normalization into F_128 (the LAST
    contraction of `_fwd_body`) so scaled transforms cost zero extra
    HBM passes. Only for `_fwd_body` consumers — `_inv_body` applies
    its own in-kernel 1/n and must get unscaled tables."""
    m = n // N1
    Fm = dft_matrix_np(m, direction)
    F1 = dft_matrix_np(N1, direction)
    if scale is not None:
        F1 = F1 * float(scale)
    # tw[k2, j1] = W_n^{j1*k2}: stage_twiddle_np(r=m, m=N1) gives
    # T[a, b] = W_{m*N1}^{a*b} with a over k2 (m) and b over j1 (N1).
    tw = stage_twiddle_np(m, N1, direction)
    c = lambda a: jnp.asarray(np.ascontiguousarray(a).astype(dtype))
    return (c(Fm.real), c(Fm.imag), c(F1.real), c(F1.imag),
            c(tw.real), c(tw.imag))


def _fwd_body(xr, xi, tabs):
    """The forward four-step on one (m, 128) block; returns (128, m)."""
    Fmr, Fmi, F1r, F1i, twr, twi = tabs
    # column FFTs: C[k2, j1] = sum_j2 F_m[k2, j2] * B[j2, j1]
    cr, ci = _cdot(Fmr, Fmi, xr, xi)
    # twiddle
    tr = cr * twr - ci * twi
    ti = cr * twi + ci * twr
    # row FFTs: D[k2, k1] = sum_j1 C[k2, j1] * F_128[k1, j1]
    dr, di = _cdot(tr, ti, F1r.T, F1i.T)
    return dr.T, di.T  # (128, m): X[k] = out.reshape(n)[k]


def _inv_body(sr, si, tabs_inv, n: int):
    """Inverse four-step on the (128, m) spectrum matrix S[k1, k2]
    (= forward output / filtered spectrum); returns (m, 128) scaled 1/n."""
    Fmr, Fmi, F1r, F1i, twr, twi = tabs_inv
    # Inverse with roles swapped (n1'=m, n2'=128): B'[j2', j1'] with
    # j2' in [128), j1' in [m) is exactly S (128, m).
    cr, ci = _cdot(F1r, F1i, sr, si)                # (128,128)@(128,m)
    # tw'[k2', j1'] = W_n^{-j1'*k2'} = twiddle with axes (128, m) = tw^T
    tr = cr * twr.T - ci * twi.T
    ti = cr * twi.T + ci * twr.T
    dr, di = _cdot(tr, ti, Fmr.T, Fmi.T)            # (128,m)@(m,m)
    s = 1.0 / n
    return dr.T * s, di.T * s  # (m, 128): y[j] = out.reshape(n)[j]


def _fft_kernel(xr_ref, xi_ref, Fmr, Fmi, F1r, F1i, twr, twi,
                or_ref, oi_ref, *, rows: int = 1):
    """`rows` batch rows per grid program: below m=64 a single (m, m) @
    (m, 128) matmul underfills the MXU and per-program DMA overhead
    dominates (the measured 4K loss, docs/performance.md r1) — batching
    R rows per residency amortizes both. The R matmuls share the
    constant tables and unroll statically."""
    tabs = (Fmr[...], Fmi[...], F1r[...], F1i[...], twr[...], twi[...])
    for r in range(rows):
        yr, yi = _fwd_body(xr_ref[r], xi_ref[r], tabs)
        or_ref[r] = yr
        oi_ref[r] = yi


def _filter_kernel(xr_ref, xi_ref,
                   Fmr, Fmi, F1r, F1i, twr, twi,
                   Gmr, Gmi, G1r, G1i, tvr, tvi,
                   hr_ref, hi_ref,
                   or_ref, oi_ref):
    fwd = (Fmr[...], Fmi[...], F1r[...], F1i[...], twr[...], twi[...])
    inv = (Gmr[...], Gmi[...], G1r[...], G1i[...], tvr[...], tvi[...])
    sr, si = _fwd_body(xr_ref[0], xi_ref[0], fwd)   # (128, m)
    hr, hi = hr_ref[...], hi_ref[...]               # (128, m) matrix form
    gr = sr * hr - si * hi
    gi = sr * hi + si * hr
    yr, yi = _inv_body(gr, gi, inv, xr_ref.shape[-2] * N1)
    or_ref[0] = yr
    oi_ref[0] = yi


def _specs(m: int, n_tables: int):
    """Grid/block specs: batch-gridded rows + replicated constant tables."""
    row_in = pl.BlockSpec((1, m, N1), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return row_in, [const2() for _ in range(n_tables)]


def _rows_per_program(m: int, B: int) -> int:
    """Batch rows per grid program: small m -> more rows (up to 8) so
    VMEM residency stays ~512 KB and the MXU sees enough work; divides B
    so the grid is exact."""
    target = max(64 // m, 1)  # m=8 -> 8 rows, m=32 -> 2, m>=64 -> 1
    r = min(target, 8, B)
    while B % r:
        r -= 1
    return max(r, 1)


@functools.partial(
    jax.jit, static_argnames=("direction", "interpret", "scale")
)
def _pallas_fft_impl(xr, xi, *, direction: Direction, interpret: bool,
                     scale=None):
    batch = xr.shape[:-1]
    n = int(xr.shape[-1])
    m = n // N1
    B = int(np.prod(batch)) if batch else 1
    R = _rows_per_program(m, B)
    xr3 = xr.reshape(B, m, N1)
    xi3 = xi.reshape(B, m, N1)
    eff = (1.0 / n if direction == Direction.INVERSE else 1.0)
    eff *= (scale if scale is not None else 1.0)
    tabs = _tables(n, direction, xr.dtype,
                   scale=None if eff == 1.0 else eff)
    row_in = pl.BlockSpec((R, m, N1), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    consts = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in tabs]
    row_out = pl.BlockSpec((R, N1, m), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_fft_kernel, rows=R),
        grid=(B // R,),
        in_specs=[row_in, row_in] + consts,
        out_specs=(row_out, row_out),
        out_shape=(
            jax.ShapeDtypeStruct((B, N1, m), xr.dtype),
            jax.ShapeDtypeStruct((B, N1, m), xr.dtype),
        ),
        # Whole-call totals (the pallas CostEstimate convention the
        # large-n kernels already follow): B rows at ~8n(m+N1) flops
        # and 16n bytes each.
        cost_estimate=pl.CostEstimate(
            flops=8 * n * (m + N1) * B, transcendentals=0,
            bytes_accessed=4 * 4 * n * B,
        ),
        interpret=interpret,
    )(xr3, xi3, *tabs)
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


def pallas_fft_split(xr, xi, direction=FORWARD, interpret: bool = False,
                     scale: float | None = None):
    """Batched FFT on split planes via the VMEM-resident kernel.

    xr, xi: float32 [..., n] with n = m*128, m in {8..128} pow2.
    Forward unscaled / inverse 1/n (reference convention). `scale`
    folds an extra output normalization into the tables for free."""
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_size(n):
        raise ValueError(
            f"pallas_fft_split supports n = m*128, m in 8..128 pow2; got {n}"
        )
    return _pallas_fft_impl(
        xr, xi, direction=Direction(int(direction)),
        interpret=bool(interpret),
        scale=None if scale is None else float(scale),
    )


def _default_interpret() -> bool:
    """Mosaic kernels only compile for TPU; interpret elsewhere."""
    return jax.default_backend() != "tpu"


def pallas_fft(x, direction=FORWARD, interpret: bool | None = None):
    """Complex-dtype convenience wrapper (CPU/tests; TPU callers should
    pass split planes directly — this env's TPU rejects complex)."""
    if interpret is None:
        interpret = _default_interpret()
    x = jnp.asarray(x)
    yr, yi = pallas_fft_split(
        jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32),
        direction, interpret,
    )
    return jax.lax.complex(yr, yi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_filter_impl(xr, xi, hr2, hi2, *, interpret: bool):
    batch = xr.shape[:-1]
    n = int(xr.shape[-1])
    m = n // N1
    B = int(np.prod(batch)) if batch else 1
    xr3 = xr.reshape(B, m, N1)
    xi3 = xi.reshape(B, m, N1)
    fwd = _tables(n, Direction.FORWARD, xr.dtype)
    inv = _tables(n, Direction.INVERSE, xr.dtype)
    row_in, consts = _specs(m, len(fwd) + len(inv) + 2)
    yr, yi = pl.pallas_call(
        _filter_kernel,
        grid=(B,),
        in_specs=[row_in, row_in] + consts,
        out_specs=(row_in, row_in),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, N1), xr.dtype),
            jax.ShapeDtypeStruct((B, m, N1), xr.dtype),
        ),
        # Whole-call totals: B rows, forward + inverse per row.
        cost_estimate=pl.CostEstimate(
            flops=16 * n * (m + N1) * B, transcendentals=0,
            bytes_accessed=4 * 4 * n * B,
        ),
        interpret=interpret,
    )(xr3, xi3, *fwd, *inv, hr2, hi2)
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


def pallas_spectral_filter(xr, xi, hr, hi, interpret: bool = False):
    """Fused FFT -> H -> IFFT in ONE VMEM residency (the SURVEY.md §3.4
    sandwich as a single kernel).

    hr, hi: the frequency response H[k] over the full n bins (split).
    Equivalent to ifft(fft(x) * H) with 1/n inverse scaling."""
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n = int(xr.shape[-1])
    if not supported_size(n):
        raise ValueError(f"unsupported n={n} (need m*128, m in 8..128 pow2)")
    m = n // N1
    # Matrix form of H matching the forward output layout S[k1, k2]:
    # H2[k1, k2] = H[k2 + m*k1] = H.reshape(128, m) row-major.
    hr2 = jnp.asarray(hr).reshape(N1, m)
    hi2 = jnp.asarray(hi).reshape(N1, m)
    return _pallas_filter_impl(xr, xi, hr2, hi2, interpret=bool(interpret))


# ---------------------------------------------------------------------------
# Differentiability: custom VJP (Pallas kernels are not traced by AD)
# ---------------------------------------------------------------------------
#
# The DFT is linear, so the VJP of the unscaled forward transform is the
# unscaled transform in the opposite direction applied to the cotangent
# (F^T = F for the symmetric DFT matrix; the adjoint of the INVERSE's
# 1/n scaling is the same scalar). This makes the kernel usable inside
# jax.grad pipelines (e.g. learned spectral filters).


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_fft_split_ad(xr, xi, direction=FORWARD, interpret: bool = False):
    """`pallas_fft_split` with a custom VJP (differentiable)."""
    return pallas_fft_split(xr, xi, direction, interpret)


from fftlab.kernels._ad import make_vjp_rules

pallas_fft_split_ad.defvjp(*make_vjp_rules(pallas_fft_split))
