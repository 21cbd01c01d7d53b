"""Shared custom-VJP rules for the Pallas FFT kernels.

Every kernel in this package implements the same transform convention —
forward unscaled, inverse 1/n-scaled (radix2_dit.c:115-119) — so they
all share one adjoint: the DFT is linear and the adjoint of the real
split-plane pipeline [[Fr, -Fi], [Fi, Fr]] is its transpose, i.e. the
OPPOSITE-direction transform, rescaled to undo/apply the inverse's 1/n.
Pallas kernels are not traced by AD, hence the explicit rule.
"""

from __future__ import annotations

import jax.numpy as jnp

from fftlab.core.types import Direction


def make_vjp_rules(fft_fn):
    """(fwd, bwd) for `jax.custom_vjp(..., nondiff_argnums=(2, 3))`
    around `fft_fn(xr, xi, direction, interpret) -> (yr, yi)` with the
    forward-unscaled / inverse-1/n convention."""

    def fwd(xr, xi, direction, interpret):
        return fft_fn(xr, xi, direction, interpret), None

    def bwd(direction, interpret, _res, g):
        gr, gi = g
        n = int(gr.shape[-1])
        opp = Direction(-int(Direction(int(direction))))
        br, bi = fft_fn(gr, gi, opp, interpret)
        if opp == Direction.INVERSE:
            # The kernel's INVERSE applied 1/n, but the adjoint of the
            # unscaled FORWARD is the unscaled opposite: undo the 1/n.
            s = jnp.asarray(float(n), dtype=br.dtype)
        else:
            # Adjoint of the INVERSE (which included 1/n): apply 1/n.
            s = jnp.asarray(1.0 / n, dtype=br.dtype)
        return br * s, bi * s

    return fwd, bwd
