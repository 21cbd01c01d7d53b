"""Shared helpers for algorithm implementations."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fftlab.core.types import Direction, as_complex_array


def prepare(x, direction):
    """Promote to complex, normalize direction, return (x, n, direction)."""
    x = as_complex_array(x)
    direction = Direction(int(direction))
    return x, int(x.shape[-1]), direction


def const(arr_np: np.ndarray, like) -> jnp.ndarray:
    """Embed a host-precomputed float64/complex128 table as a constant of
    the computation dtype."""
    return jnp.asarray(np.asarray(arr_np).astype(like.dtype))


def inverse_scale(x, n: int, direction: Direction):
    """Apply the 1/n inverse scaling (radix2_dit.c:115-119 convention)."""
    if direction == Direction.INVERSE:
        from fftlab.core.types import real_dtype_for

        return x * jnp.asarray(1.0 / n, dtype=real_dtype_for(x.dtype))
    return x
