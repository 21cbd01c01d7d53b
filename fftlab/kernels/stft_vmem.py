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
import numpy as np
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), const()]
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
    if not supported_size(fft_size):
        raise ValueError(f"fft_size must be m*128, m in 8..128 pow2; got {fft_size}")
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
    yr, yi = _pallas_stft_impl(
        x2d, w2d, fft_size=fft_size, hop=hop, interpret=bool(interpret)
    )
    if onesided:
        h = fft_size // 2 + 1
        return yr[:, :h], yi[:, :h]
    return yr, yi
