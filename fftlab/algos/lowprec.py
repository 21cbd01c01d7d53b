"""Reduced-precision FFT experiments — the TPU analog of the reference's
fixed-point track (optimizations/fixed_point_fft.c).

The reference trades precision for speed with Q15 int16 + block scaling;
on TPU the equivalent knobs are the MXU input precision (bf16 passes) and
table storage dtype. This module exposes the spectrum of choices and
measures what each costs in SNR — the Q15 C++ oracle
(fftlab.native.q15) anchors the low end.

Modes (matmul precision on the split-Stockham path):
  'f32'    HIGHEST — 6 bf16 passes, ~137 dB SNR at 1M pts (default)
  'f32x3'  HIGH    — 3 bf16 passes, ~92 dB (fails the 100 dB gate; fine
                     for audio/display pipelines)
  'bf16'   DEFAULT — 1 bf16 pass, ~48 dB (the Q15-class regime: Q15
                     block-float measures ~30 dB)

Block scaling (fixed_point_fft.c:169-178 per-stage >>1) is unnecessary
in floating point — the exponent IS the block scale — so the TPU mapping
of "block-floating-point" is simply bf16's shared-exponent-free format;
the experiment quantifies that equivalence.
"""

from __future__ import annotations

import numpy as np

import jax

from fftlab.core.types import FORWARD

_PRECISIONS = {
    "f32": jax.lax.Precision.HIGHEST,
    "f32x3": jax.lax.Precision.HIGH,
    "bf16": jax.lax.Precision.DEFAULT,
}


def fft_split_lowprec(xr, xi, direction=FORWARD, mode: str = "f32",
                      leaf: int = 128):
    """Split-complex FFT at a chosen MXU precision mode.

    Default 'f32' = Precision.HIGHEST (the module header's table; this
    TPU requires it for the 100 dB gate) — the reduced modes are
    explicit opt-ins."""
    if mode not in _PRECISIONS:
        raise ValueError(f"mode must be one of {sorted(_PRECISIONS)}")
    from fftlab.algos.split_stockham import fft_split

    return fft_split(xr, xi, direction, leaf,
                     precision=_PRECISIONS[mode])


def snr_vs_oracle(n: int = 4096, batch: int = 2, seed: int = 0,
                  modes=("f32", "f32x3", "bf16")) -> dict:
    """Measure each mode's SNR against the float64 numpy oracle.

    Returns {mode: snr_db}; include the Q15 native oracle as 'q15' when
    the native library is available.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xr = rng.standard_normal((batch, n)).astype(np.float32)
    xi = rng.standard_normal((batch, n)).astype(np.float32)
    want = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    out = {}
    for mode in modes:
        yr, yi = fft_split_lowprec(jnp.asarray(xr), jnp.asarray(xi),
                                   mode=mode)
        got = (np.asarray(yr, dtype=np.float64)
               + 1j * np.asarray(yi, dtype=np.float64))
        err = np.sum(np.abs(got - want) ** 2)
        out[mode] = float(10 * np.log10(np.sum(np.abs(want) ** 2)
                                        / max(err, 1e-300)))
    try:
        from fftlab.native.q15 import q15_fft_float

        z = (xr[0] + 1j * xi[0]) / (4 * np.abs(xr[0] + 1j * xi[0]).max())
        got = q15_fft_float(z)
        wq = np.fft.fft(z)
        out["q15"] = float(10 * np.log10(
            np.sum(np.abs(wq) ** 2)
            / max(np.sum(np.abs(got - wq) ** 2), 1e-300)
        ))
    except (RuntimeError, ImportError):
        pass
    return out
