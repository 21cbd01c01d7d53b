"""Real-input (r2c) and real-output (c2r) transforms — done right.

The reference never finished these: `fft_plan_r2c_1d` has a use-after-free
(fft_auto.c:391-403) and `fft_plan_c2r_1d` returns NULL (fft_auto.c:405-408).
Here they are first-class, batched, and use the pack-two-reals trick
(SURVEY.md §7 hard part 5): an n-point real FFT costs one n/2-point complex
FFT plus an O(n) Hermitian unpack.

Conventions (match numpy's rfft/irfft):
  rfft:  real [..., n] -> complex [..., n/2+1]   (forward basis e^{-2*pi*i*jk/n})
  irfft: complex [..., n/2+1] -> real [..., n], scaled by 1/n.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fftlab.algos._common import const
from fftlab.core.types import Direction, complex_dtype_for, real_dtype_for


def _default_cfft():
    from fftlab.algos.stockham import stockham_fft

    return stockham_fft


def _half_twiddle(n: int, direction: int) -> np.ndarray:
    k = np.arange(n // 2 + 1, dtype=np.float64)
    return np.exp(2j * np.pi * float(direction) * k / n)


def rfft(x, cfft=None):
    """Real-to-complex FFT of the last axis; returns n//2+1 bins.

    Even n uses the half-size-complex packing: z[j] = x[2j] + i*x[2j+1],
    Z = FFT_{n/2}(z), then
      E[k] = (Z[k] + conj(Z[-k]))/2,  O[k] = (Z[k] - conj(Z[-k]))/(2i)
      X[k] = E[k] + W_n^k * O[k].
    Odd n falls back to a complex FFT of the promoted input.
    """
    x = jnp.asarray(x)
    if np.dtype(x.dtype).kind == "c":
        raise TypeError("rfft expects real input; use fft() for complex data")
    n = int(x.shape[-1])
    if cfft is None:
        cfft = _default_cfft()
    h = n // 2 + 1
    if n % 2 or n < 4:
        X = cfft(x.astype(complex_dtype_for(x.dtype)), Direction.FORWARD)
        return X[..., :h]

    cdtype = complex_dtype_for(x.dtype)
    z = x[..., 0::2].astype(cdtype) + 1j * x[..., 1::2].astype(cdtype)
    Z = cfft(z, Direction.FORWARD)  # [..., n/2]
    # Zext[k] for k = 0..n/2 with wraparound Zext[n/2] = Z[0].
    Zext = jnp.concatenate([Z, Z[..., :1]], axis=-1)
    Zrev = jnp.conj(Zext[..., ::-1])  # conj(Z[(n/2 - k) mod n/2])
    E = 0.5 * (Zext + Zrev)
    O = -0.5j * (Zext - Zrev)
    w = const(_half_twiddle(n, Direction.FORWARD), Zext)
    return E + w * O


def irfft(X, n: int | None = None, cfft=None):
    """Complex-to-real inverse FFT (Hermitian input, n//2+1 bins -> n reals).

    Inverts the packing: Z[k] = E[k] + i * W_n^{-k}... precisely,
      E[k] = (X[k] + conj(X[n/2-k]))/2,  O[k] = (X[k] - conj(X[n/2-k]))/2 * W_n^{-k}...
    implemented as Z[k] = E[k] + i*O[k] with O[k] recovered via the inverse
    twiddle, then one n/2-point inverse complex FFT and re-interleaving.
    """
    X = jnp.asarray(X)
    h = int(X.shape[-1])
    if n is None:
        n = 2 * (h - 1)
    if cfft is None:
        cfft = _default_cfft()
    rdtype = real_dtype_for(X.dtype)
    if n % 2 or n < 4:
        # Rebuild the full Hermitian spectrum and take a complex inverse FFT.
        tail = jnp.conj(X[..., 1 : n - h + 1][..., ::-1])
        full = jnp.concatenate([X[..., :h], tail], axis=-1)
        return jnp.real(cfft(full, Direction.INVERSE)).astype(rdtype)

    Xrev = jnp.conj(X[..., ::-1])  # X-like at index n/2 - k
    E = 0.5 * (X + Xrev)
    w = const(_half_twiddle(n, Direction.INVERSE), X)  # W_n^{-k} for forward basis
    O = 0.5 * (X - Xrev) * w
    Z = (E + 1j * O)[..., : n // 2]
    # z = IFFT_{n/2}(Z) recovers the packed sequence exactly (the 1/(n/2)
    # inverse normalization is the correct one — E/O were unscaled forwards).
    z = cfft(Z, Direction.INVERSE)
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)
    return out.reshape(*out.shape[:-2], n).astype(rdtype)


def rfftfreq(n: int, d: float = 1.0) -> np.ndarray:
    """Bin center frequencies for rfft output (host-side)."""
    return np.arange(n // 2 + 1, dtype=np.float64) / (n * d)
