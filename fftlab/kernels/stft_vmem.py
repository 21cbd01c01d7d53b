"""Streaming STFT kernel: windowed frames DMA'd from HBM, transformed in
VMEM, never materialized.

The XLA STFT path (dsp/stft.py) first gathers all overlapping frames —
for the analyzer's 75% overlap (hop = fft_size/4) that materializes 4x
the signal in HBM before the batched FFT reads it again. This kernel
instead keeps the signal in HBM and has each grid program DMA just its
frame (start = frame * hop) into VMEM scratch, apply the window, and run
the four-step MXU FFT from kernels/fft_vmem.py — one read of the signal
total, no frame tensor.

This is the TPU re-design of the realtime analyzer's circular-buffer hop
loop (realtime_analyzer.c:58-93): the "hop trigger" becomes the grid,
the buffer becomes HBM, and the per-hop window+FFT is the kernel body.

Constraints: fft_size = m*128 (m in 8..128 pow2), hop % 128 == 0,
signal length % 128 == 0 (pad the tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.window import get_window
from fftlab.core.types import Direction
from fftlab.kernels.fft_vmem import N1, _cdot, _tables, supported_size


def _fwd_body_real(x, tabs):
    """Forward four-step for REAL input (imag = 0): first-stage complex
    matmul collapses to two real matmuls. Returns (128, m) spectrum."""
    Fmr, Fmi, F1r, F1i, twr, twi = tabs
    p = jax.lax.Precision.HIGHEST
    cr = jnp.dot(Fmr, x, precision=p)
    ci = jnp.dot(Fmi, x, precision=p)
    tr = cr * twr - ci * twi
    ti = cr * twi + ci * twr
    dr, di = _cdot(tr, ti, F1r.T, F1i.T)
    return dr.T, di.T


def _stft_kernel(x_hbm, w_ref, Fmr, Fmi, F1r, F1i, twr, twi,
                 or_ref, oi_ref, frame_vmem, sem,
                 *, hop_rows: int):
    f = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(f * hop_rows, frame_vmem.shape[0]), :],
        frame_vmem,
        sem,
    )
    dma.start()
    dma.wait()
    tabs = (Fmr[...], Fmi[...], F1r[...], F1i[...], twr[...], twi[...])
    yr, yi = _fwd_body_real(frame_vmem[...] * w_ref[...], tabs)
    or_ref[0] = yr
    oi_ref[0] = yi


@functools.partial(
    jax.jit, static_argnames=("fft_size", "hop", "interpret")
)
def _pallas_stft_impl(x2d, w2d, *, fft_size: int, hop: int,
                      interpret: bool):
    m = fft_size // N1
    hop_rows = hop // N1
    total_rows = int(x2d.shape[0])
    n_frames = (total_rows - m) // hop_rows + 1
    tabs = _tables(fft_size, Direction.FORWARD, x2d.dtype)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, N1, m), lambda f: (f, 0, 0),
                            memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_stft_kernel, hop_rows=hop_rows),
        grid=(n_frames,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), const()]
                 + [const() for _ in range(len(tabs))],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_frames, N1, m), x2d.dtype),
            jax.ShapeDtypeStruct((n_frames, N1, m), x2d.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, N1), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2d, w2d, *tabs)
    return yr.reshape(n_frames, fft_size), yi.reshape(n_frames, fft_size)


# ---------------------------------------------------------------------------
# Small frames (128..512): Welch's default segmenting (window 256, 50%
# overlap) is far below the one-frame-per-program kernel's m >= 8 range.
# Frames at overlap factor f = frame/hop split into f interleaved SETS of
# non-overlapping frames; each grid program DMAs one contiguous span of
# FBS frames from one set and transforms them all with three batched MXU
# ops (the (B, j, lane) dot_general pattern of kernels/fourstep_vmem).
# Total HBM reads = f * signal — identical to any framing at overlap f —
# with zero frame-tensor materialization.
# ---------------------------------------------------------------------------

FBS = 32  # frames per program in the small-frame kernel


def small_frame_supported(fft_size: int, hop: int) -> bool:
    if fft_size % N1 or hop % N1 or hop <= 0 or hop > fft_size:
        return False
    m = fft_size // N1
    return m in (1, 2, 4) and m % (hop // N1) == 0


def _stft_small_kernel(x_hbm, w_ref, Fmr, Fmi, F1r, F1i, twr, twi,
                       or_ref, oi_ref, blk_vmem, sem,
                       *, hop_rows: int, m: int, fb: int, f_sets: int):
    s = pl.program_id(0)     # interleave set
    sup = pl.program_id(1)   # superblock of fb*f_sets frames
    start = (sup * fb * f_sets + s) * hop_rows
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, fb * m), :], blk_vmem, sem
    )
    dma.start()
    dma.wait()
    p = jax.lax.Precision.HIGHEST
    x3 = blk_vmem[...].reshape(fb, m, N1) * w_ref[...].reshape(1, m, N1)
    # column FFTs over j2 (the m axis): C[f, j1, k2]
    dn = (((1,), (1,)), ((), ()))
    cr = jax.lax.dot_general(x3, Fmr[...], dn, precision=p)
    ci = jax.lax.dot_general(x3, Fmi[...], dn, precision=p)
    # twiddle W_n^{j1*k2} as (1, j1, k2)
    tr = cr * twr[...] - ci * twi[...]
    ti = cr * twi[...] + ci * twr[...]
    # row FFTs over j1 (the 128 axis): D[f, k2, k1]
    dr = (jax.lax.dot_general(tr, F1r[...], dn, precision=p)
          - jax.lax.dot_general(ti, F1i[...], dn, precision=p))
    di = (jax.lax.dot_general(tr, F1i[...], dn, precision=p)
          + jax.lax.dot_general(ti, F1r[...], dn, precision=p))
    # natural order per frame is (k1, k2) — swap the minor two axes
    or_ref[0, 0] = jnp.transpose(dr, (0, 2, 1))
    oi_ref[0, 0] = jnp.transpose(di, (0, 2, 1))


@functools.partial(
    jax.jit, static_argnames=("fft_size", "hop", "interpret")
)
def _pallas_stft_small_impl(x2d, w2d, *, fft_size: int, hop: int,
                            interpret: bool):
    m = fft_size // N1
    hop_rows = hop // N1
    f_sets = m // hop_rows
    total_rows = int(x2d.shape[0])
    n_frames = (total_rows - m) // hop_rows + 1
    # Shrink the per-program frame count for short signals so the last
    # superblock does not round the work up by (FBS*f_sets - 1) padded
    # zero frames (code-review r2s2 finding).
    fb = max(min(FBS, -(-n_frames // f_sets)), 1)
    n_sup = -(-n_frames // (fb * f_sets))
    need_rows = (n_sup * fb * f_sets - 1) * hop_rows + m
    if need_rows > total_rows:
        x2d = jnp.pad(x2d, ((0, need_rows - total_rows), (0, 0)))
    tabs = _tables(fft_size, Direction.FORWARD, x2d.dtype)
    # tw arrives as (k2=m, j1=128); the kernel wants (1, j1, k2).
    Fmr, Fmi, F1r, F1i, twr, twi = tabs
    twr = twr.T.reshape(1, N1, m)
    twi = twi.T.reshape(1, N1, m)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, fb, N1, m),
                            lambda s, sup: (s, sup, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_stft_small_kernel, hop_rows=hop_rows, m=m,
                          fb=fb, f_sets=f_sets),
        grid=(f_sets, n_sup),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), const()]
                 + [const() for _ in range(6)],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((f_sets, n_sup, fb, N1, m), x2d.dtype),
            jax.ShapeDtypeStruct((f_sets, n_sup, fb, N1, m), x2d.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((fb * m, N1), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2d, w2d, Fmr, Fmi, F1r, F1i, twr, twi)
    # (s, sup, t) -> natural frame j = sup*(FBS*f_sets) + t*f_sets + s
    yr = jnp.transpose(yr, (1, 2, 0, 3, 4)).reshape(-1, fft_size)
    yi = jnp.transpose(yi, (1, 2, 0, 3, 4)).reshape(-1, fft_size)
    return yr[:n_frames], yi[:n_frames]


def pallas_stft_split(x, fft_size: int = 2048, hop: int = 512,
                      window="hann", onesided: bool = True,
                      interpret: bool | None = None):
    """Streaming STFT of a real 1D signal -> (re, im) spectra
    [n_frames, bins] without materializing the frame tensor.

    Framing: starts at k*hop for k in [0, (n - fft_size)//hop + 1)
    (tail frames needing padding are the caller's concern — pad first).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(x)
    if x.ndim != 1:
        raise ValueError(f"pallas_stft_split expects a 1D signal, got {x.shape}")
    small = small_frame_supported(fft_size, hop)
    if not supported_size(fft_size) and not small:
        raise ValueError(
            f"fft_size must be m*128, m in 8..128 pow2 (or 1/2/4 with "
            f"hop dividing the frame); got {fft_size} (hop {hop})"
        )
    if hop % N1 or hop <= 0:
        raise ValueError(f"hop must be a positive multiple of {N1}; got {hop}")
    n = int(x.shape[-1])
    if n % N1:
        x = jnp.pad(x, (0, N1 - n % N1))
        n = int(x.shape[-1])
    if n < fft_size:
        raise ValueError(f"signal ({n}) shorter than fft_size ({fft_size})")
    x2d = x.astype(jnp.float32).reshape(n // N1, N1)
    m = fft_size // N1
    w2d = jnp.asarray(
        get_window(window, fft_size), dtype=jnp.float32
    ).reshape(m, N1)
    impl = _pallas_stft_small_impl if not supported_size(fft_size) \
        else _pallas_stft_impl
    yr, yi = impl(
        x2d, w2d, fft_size=fft_size, hop=hop, interpret=bool(interpret)
    )
    if onesided:
        h = fft_size // 2 + 1
        return yr[:, :h], yi[:, :h]
    return yr, yi
