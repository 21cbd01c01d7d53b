"""Mixed-radix Cooley-Tukey FFT with genuine factorization.

The reference's mixed-radix dispatch falls back to a whole-array O(n^2) DFT
for any non-power-of-two (mixed_radix.c:127-137) despite shipping small-N
codelets it never calls (mixed_radix.c:67-104). This module does it for
real: trial-division factorization, recursive Cooley-Tukey decomposition
n = p * m with the codelets of algos/codelets.py at each level, and a
Bluestein fallback only for large prime factors.

Each recursion level on a `[..., n]` array:
  1. reshape to [..., p, m]            (j = j1*m + j2)
  2. codelet DFT over the p axis       (j1 -> k1)
  3. twiddle exp(2*pi*i*dir*k1*j2/n)
  4. recurse over the m axis
  5. transpose [..., p, m] -> [..., m, p], flatten: X[k2*p + k1]
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from fftlab.algos._common import const, inverse_scale, prepare
from fftlab.algos.codelets import apply_codelet
from fftlab.core.twiddle import stage_twiddle_np
from fftlab.core.types import Direction, FORWARD

# Primes above this use Bluestein rather than an O(p^2) codelet matmul.
_LARGE_PRIME = 64


@functools.lru_cache(maxsize=None)
def factorize(n: int) -> tuple[int, ...]:
    """Trial-division prime factorization, smallest first (mixed_radix.c:24-55)."""
    if n < 1:
        raise ValueError(f"cannot factorize n={n}")
    factors = []
    m = n
    p = 2
    while p * p <= m:
        while m % p == 0:
            factors.append(p)
            m //= p
        p += 1 if p == 2 else 2
    if m > 1:
        factors.append(m)
    return tuple(factors)


def is_prime(n: int) -> bool:
    return n > 1 and factorize(n) == (n,)


def is_highly_composite(n: int) -> bool:
    """Reference planner's notion: only factors 2,3,5,7 and >= 3 of them
    (fft_auto.c:116-133)."""
    f = factorize(n)
    return len(f) >= 3 and all(p in (2, 3, 5, 7) for p in f)


def _mixed_radix_unscaled(x, n: int, direction: Direction):
    if n == 1:
        return x
    factors = factorize(n)
    p = factors[0]
    if p == n and p > _LARGE_PRIME:
        # Large prime: chirp-z (unscaled — caller applies 1/n once).
        from fftlab.algos.bluestein import bluestein_fft

        y = bluestein_fft(x, direction)
        if direction == Direction.INVERSE:
            y = y * jnp.asarray(float(n), dtype=jnp.real(x).dtype)
        return y
    if p == n:
        # Small prime leaf: one codelet application.
        return apply_codelet(x[..., :, None], p, direction)[..., :, 0]

    m = n // p
    batch = x.shape[:-1]
    y = x.reshape(*batch, p, m)
    y = apply_codelet(y, p, direction)  # DFT over the p axis
    y = y * const(stage_twiddle_np(p, m, direction), x)  # [p, m] twiddles
    y = _mixed_radix_unscaled(y, m, direction)  # recurse over last axis
    y = jnp.swapaxes(y, -1, -2)  # X[k2*p + k1]
    return y.reshape(*batch, n)


def mixed_radix_fft(x, direction=FORWARD):
    """General-size FFT by prime factorization (arbitrary n >= 1)."""
    x, n, direction = prepare(x, direction)
    y = _mixed_radix_unscaled(x, n, direction)
    return inverse_scale(y, n, direction)


def mixed_radix_fft_recursive(x, direction=FORWARD):
    """Alias mirroring the reference's recursive entry point
    (fft_algorithms.h:40, mixed_radix.c:140)."""
    return mixed_radix_fft(x, direction)


if __name__ == "__main__":
    from fftlab.algos._common import run_module_demo

    run_module_demo("mixed_radix_fft", mixed_radix_fft)
