"""Fused streaming overlap-save filter kernel: DMA framing + FFT + H +
IFFT + valid-write, one VMEM residency per block.

The XLA overlap-save path must materialize the overlapped frame tensor;
on this TPU backend the only framing that even compiles is a slow
elementwise gather (core/framing.py). This kernel sidesteps framing
entirely — each grid program DMAs its block (start = k*hop) straight
from the HBM-resident signal, runs the four-step filter sandwich from
kernels/fft_vmem.py in VMEM, and writes only the valid (non-aliased)
samples, which land contiguously in the output. One read of the signal,
one write of the result: the speed-of-light streaming filter.

Alignment: the overlap (halo) is rounded up to a whole number of
128-lane rows, so hop = fft_size - halo_rows*128 stays row-aligned and
both the DMA start and the valid-write are plain block indices.

This is the reference's FFT->H->IFFT hot pipeline (fft_filtering.c:
111-132 + convolution.c overlap-save description) as a single kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.types import Direction
from fftlab.kernels.fft_vmem import (
    N1,
    _fwd_body,
    _inv_body,
    _tables,
    supported_size,
)


def _os_kernel(x_hbm, hr_ref, hi_ref,
               Fmr, Fmi, F1r, F1i, twr, twi,
               Gmr, Gmi, G1r, G1i, tvr, tvi,
               or_ref, oi_ref, fr_vmem, fi_vmem, semr, semi,
               *, hop_rows: int, halo_rows: int, m: int):
    c = pl.program_id(0)   # channel (flattened batch)
    k = pl.program_id(1)   # overlap-save block along time
    dmar = pltpu.make_async_copy(
        x_hbm.at[0, c, pl.ds(k * hop_rows, m), :], fr_vmem, semr
    )
    dmai = pltpu.make_async_copy(
        x_hbm.at[1, c, pl.ds(k * hop_rows, m), :], fi_vmem, semi
    )
    dmar.start()
    dmai.start()
    dmar.wait()
    dmai.wait()
    fwd = (Fmr[...], Fmi[...], F1r[...], F1i[...], twr[...], twi[...])
    inv = (Gmr[...], Gmi[...], G1r[...], G1i[...], tvr[...], tvi[...])
    sr, si = _fwd_body(fr_vmem[...], fi_vmem[...], fwd)   # (128, m)
    hr, hi = hr_ref[...], hi_ref[...]
    gr = sr * hr - si * hi
    gi = sr * hi + si * hr
    yr, yi = _inv_body(gr, gi, inv, m * N1)               # (m, 128)
    or_ref[0, 0] = yr[halo_rows:, :]                      # valid tail
    oi_ref[0, 0] = yi[halo_rows:, :]


@functools.partial(
    jax.jit,
    static_argnames=("nh", "fft_size", "interpret"),
)
def _os_filter_impl(xr, xi, hr2, hi2, *, nh: int, fft_size: int,
                    interpret: bool):
    C, n = xr.shape
    m = fft_size // N1
    halo_rows = -(-(nh - 1) // N1)
    hop_rows = m - halo_rows
    hop = hop_rows * N1
    halo = halo_rows * N1
    n_blocks = -(-n // hop)
    # Signal laid out as rows of 128 with a leading halo of zeros and a
    # tail pad so every block's DMA is in bounds.
    total_rows = halo_rows + n_blocks * hop_rows + m  # generous tail slack
    pad = total_rows * N1 - n
    xr2 = jnp.pad(xr, ((0, 0), (halo, pad - halo))).reshape(
        C, total_rows, N1)
    xi2 = jnp.pad(xi, ((0, 0), (halo, pad - halo))).reshape(
        C, total_rows, N1)
    x2 = jnp.stack([xr2, xi2])  # (2, C, rows, 128) single HBM operand
    fwd = _tables(fft_size, Direction.FORWARD, xr.dtype)
    inv = _tables(fft_size, Direction.INVERSE, xr.dtype)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, hop_rows, N1), lambda c, k: (c, k, 0, 0),
                            memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_os_kernel, hop_rows=hop_rows,
                          halo_rows=halo_rows, m=m),
        grid=(C, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  const(), const()]
                 + [const() for _ in range(12)],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((C, n_blocks, hop_rows, N1), xr.dtype),
            jax.ShapeDtypeStruct((C, n_blocks, hop_rows, N1), xr.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, N1), xr.dtype),
            pltpu.VMEM((m, N1), xr.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2, hr2, hi2, *fwd, *inv)
    return (yr.reshape(C, n_blocks * hop)[:, :n],
            yi.reshape(C, n_blocks * hop)[:, :n])


# ---------------------------------------------------------------------------
# Pipelined aligned variant: BlockSpec-delivered frames, R per program.
#
# The manual-DMA kernel above waits for its copy before computing, so
# every tiny (m*128-sample) block pays the full DMA latency serially —
# ~4400 un-overlapped round trips for a 2^23-sample stream, which is
# what capped the serving bench at ~1.6 GS/s (docs/performance.md r2).
# When the halo can be rounded to a power-of-two number of 128-lane
# rows (halo_rows | hop_rows), overlap-save framing is expressible as
# TWO BlockSpec views of the same signal — a bulk block of R*hop rows
# plus the following halo block — and Pallas double-buffers both
# automatically: block k+1 streams in while k computes. R frames per
# program amortize the grid overhead on top.
# ---------------------------------------------------------------------------


def _aligned_layout(nh: int, fft_size: int) -> tuple[int, int] | None:
    """(halo_rows, hop_rows) for the pipelined kernel, or None if the
    taps don't fit an 8-row-aligned halo below fft_size."""
    m = fft_size // N1
    need = -(-(nh - 1) // N1)
    halo = 8
    while halo < need:
        halo *= 2
    if halo >= m:
        return None
    return halo, m - halo  # both pow2 multiples of 8 -> halo | hop


def _os_aligned_kernel(bulk_r, bulk_i, halo_r, halo_i,
                       Fmr, Fmi, F1r, F1i, twr, twi,
                       Gmr, Gmi, G1r, G1i, tvr, tvi,
                       hr_ref, hi_ref, or_ref, oi_ref,
                       fr_s, fi_s,
                       *, hop_rows: int, halo_rows: int, m: int, R: int):
    fwd = (Fmr[...], Fmi[...], F1r[...], F1i[...], twr[...], twi[...])
    inv = (Gmr[...], Gmi[...], G1r[...], G1i[...], tvr[...], tvi[...])
    hr, hi = hr_ref[...], hi_ref[...]
    for b in range(R):
        lo = b * hop_rows
        if lo + m <= R * hop_rows:
            fr = bulk_r[0, lo:lo + m]
            fi = bulk_i[0, lo:lo + m]
        else:
            # Only the LAST frame reaches past the bulk block: its tail
            # is the halo view; assemble in scratch (aligned stores).
            fr_s[:hop_rows] = bulk_r[0, lo:lo + hop_rows]
            fr_s[hop_rows:] = halo_r[0]
            fi_s[:hop_rows] = bulk_i[0, lo:lo + hop_rows]
            fi_s[hop_rows:] = halo_i[0]
            fr = fr_s[...]
            fi = fi_s[...]
        sr, si = _fwd_body(fr, fi, fwd)        # (128, m)
        gr = sr * hr - si * hi
        gi = sr * hi + si * hr
        yr, yi = _inv_body(gr, gi, inv, m * N1)  # (m, 128)
        or_ref[0, lo:lo + hop_rows] = yr[halo_rows:, :]
        oi_ref[0, lo:lo + hop_rows] = yi[halo_rows:, :]


@functools.partial(
    jax.jit,
    static_argnames=("nh", "fft_size", "interpret", "frames_per_program"),
)
def _os_filter_aligned_impl(xr, xi, hr2, hi2, *, nh: int, fft_size: int,
                            interpret: bool, frames_per_program: int = 8):
    C, n = xr.shape
    m = fft_size // N1
    halo_rows, hop_rows = _aligned_layout(nh, fft_size)
    hop = hop_rows * N1
    halo = halo_rows * N1
    n_blocks = -(-n // hop)
    R = min(frames_per_program, n_blocks)
    n_super = -(-n_blocks // R)
    # One extra super-block of padding so every bulk AND halo block is
    # in bounds and the row count divides both block heights.
    total_rows = (n_super + 1) * R * hop_rows
    pad = total_rows * N1 - n
    xr2 = jnp.pad(xr, ((0, 0), (halo, pad - halo))).reshape(
        C, total_rows, N1)
    xi2 = jnp.pad(xi, ((0, 0), (halo, pad - halo))).reshape(
        C, total_rows, N1)
    fwd = _tables(fft_size, Direction.FORWARD, xr.dtype)
    inv = _tables(fft_size, Direction.INVERSE, xr.dtype)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    bulk = pl.BlockSpec((1, R * hop_rows, N1), lambda c, k: (c, k, 0),
                        memory_space=pltpu.VMEM)
    hblk = pl.BlockSpec(
        (1, halo_rows, N1),
        lambda c, k: (c, (k + 1) * (R * hop_rows // halo_rows), 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, R * hop_rows, N1), lambda c, k: (c, k, 0),
                            memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_os_aligned_kernel, hop_rows=hop_rows,
                          halo_rows=halo_rows, m=m, R=R),
        grid=(C, n_super),
        in_specs=[bulk, bulk, hblk, hblk]
                 + [const() for _ in range(12)] + [const(), const()],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((C, n_super * R * hop_rows, N1), xr.dtype),
            jax.ShapeDtypeStruct((C, n_super * R * hop_rows, N1), xr.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, N1), xr.dtype),
            pltpu.VMEM((m, N1), xr.dtype),
        ],
        # Whole-call totals over the (C, n_super) grid: each program
        # runs R forward+inverse FFTs and streams ~R*hop fresh samples.
        cost_estimate=pl.CostEstimate(
            flops=16 * fft_size * (m + N1) * R * C * n_super,
            transcendentals=0,
            bytes_accessed=4 * 4 * R * hop * C * n_super,
        ),
        interpret=interpret,
    )(xr2, xi2, xr2, xi2, *fwd, *inv, hr2, hi2)
    return (yr.reshape(C, n_super * R * hop)[:, :n],
            yi.reshape(C, n_super * R * hop)[:, :n])


def _use_aligned(nh: int, fft_size: int) -> bool:
    import os

    if os.environ.get("FFTLAB_OS_ALIGNED", "1") == "0":
        return False
    return _aligned_layout(nh, fft_size) is not None


def pallas_os_filter_split(xr, xi, h, fft_size: int | None = None,
                           interpret: bool | None = None):
    """Causal FIR filtering of a split pair via the fused DMA
    overlap-save kernel. h: [nh] real taps. Equals
    convolve(x, h)[:n] on each plane (real h => both planes filter
    independently). xr, xi: [..., n] — leading dims are independent
    channels (the grid fans out over channel x time-block)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr, dtype=jnp.float32)
    xi = jnp.asarray(xi, dtype=jnp.float32)
    if xr.shape != xi.shape:
        raise ValueError(f"plane shapes differ: {xr.shape} vs {xi.shape}")
    batch = xr.shape[:-1]
    n = int(xr.shape[-1])
    C = 1
    for d in batch:
        C *= int(d)
    xr = xr.reshape(C, n)
    xi = xi.reshape(C, n)
    h = np.asarray(h, dtype=np.float64)
    nh = int(h.shape[-1])
    if fft_size is None:
        # The pipelined aligned kernel wants the BIGGEST supported
        # block regardless of tap count (the halo is rounded to >= 8
        # rows, so 16K keeps the read redundancy m/hop low — 1.07x for
        # nh <= 1025 — and the device probe measured 16K blocks 3x the
        # 2K ones). The supported ceiling is 16384 (fft_vmem sizes).
        fft_size = 16384
    if not supported_size(fft_size):
        raise ValueError(
            f"fft_size must be m*128, m in 8..128 pow2; got {fft_size}"
        )
    halo_rows = -(-(nh - 1) // N1)
    if halo_rows >= fft_size // N1:
        raise ValueError(f"taps {nh} too long for fft_size {fft_size}")
    # Spectrum of the taps in the kernel's (128, m) matrix layout
    # (H2[k1, k2] = H[k2 + m*k1] — fft_vmem.pallas_spectral_filter form).
    m = fft_size // N1
    H = np.fft.fft(np.pad(h, (0, fft_size - nh)))
    hr2 = jnp.asarray(H.real.astype(np.float32)).reshape(N1, m)
    hi2 = jnp.asarray(H.imag.astype(np.float32)).reshape(N1, m)
    if _use_aligned(nh, fft_size):
        import os

        R = int(os.environ.get("FFTLAB_OS_FRAMES", "8"))
        if R < 1:
            raise ValueError(f"FFTLAB_OS_FRAMES={R} must be >= 1")
        yr, yi = _os_filter_aligned_impl(
            xr, xi, hr2, hi2, nh=nh, fft_size=fft_size,
            interpret=bool(interpret), frames_per_program=R)
    else:
        yr, yi = _os_filter_impl(xr, xi, hr2, hi2, nh=nh,
                                 fft_size=fft_size,
                                 interpret=bool(interpret))
    return yr.reshape(*batch, n), yi.reshape(*batch, n)
