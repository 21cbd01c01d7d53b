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


def run_module_demo(name: str, fn, sizes=(64, 256, 1024)) -> None:
    """Standalone demo main for an algorithm module — the analog of the
    reference's `#ifndef LIB_BUILD` demo mains (e.g. radix2_dit.c:264-299
    impulse/DC/Nyquist self-tests + timing).

    Usage: `python -m fftlab.algos.<module>`.
    """
    import time

    import jax
    import numpy as np

    from fftlab.core.types import Direction

    print(f"=== {name} demo ===")
    for n in sizes:
        # Self-tests (radix2_dit.c:264-299): impulse -> flat, DC -> delta.
        imp = np.zeros(n, dtype=np.complex128)
        imp[0] = 1.0
        flat = np.asarray(fn(imp, Direction.FORWARD))
        ok1 = np.allclose(flat, 1.0, atol=1e-8)
        dc = np.asarray(fn(np.ones(n, dtype=np.complex128), Direction.FORWARD))
        ok2 = abs(dc[0] - n) < 1e-8 and np.allclose(dc[1:], 0, atol=1e-7)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        back = np.asarray(fn(np.asarray(fn(x, Direction.FORWARD)),
                             Direction.INVERSE))
        ok3 = np.allclose(back, x, atol=1e-8)
        jfn = jax.jit(lambda v: fn(v, Direction.FORWARD))
        y = jfn(jnp.asarray(x))  # compile
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(10):
            y = jfn(jnp.asarray(x))
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 10
        status = "PASS" if (ok1 and ok2 and ok3) else "FAIL"
        print(f"  n={n:<6} impulse/DC/roundtrip {status}   {dt*1e6:8.1f} us")
