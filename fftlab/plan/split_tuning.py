"""On-device autotuning for the split-plane fast path (FFT_MEASURE for
the TPU pipeline — the reference left MEASURE a TODO, fft_auto.c:233-235;
plan/planner.py implements it for the complex registry; this module
covers the device path's real knob: the stage leaf radix).

Timing uses the backend-hardened protocol (varied inputs, readback-forced
completion, iteration-count slope — see bench.py for why each part is
needed on this TPU service). Winners persist through plan/wisdom.py under
kind='split' so later processes skip the measurement.
"""

from __future__ import annotations



import numpy as np

from fftlab.plan import wisdom

DEFAULT_LEAVES = (64, 128, 256, 512)


def _measure_leaf(n: int, leaf: int, batch: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from fftlab.algos.split_stockham import fft_split
    from fftlab.bench.timing import slope_time

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    f = jax.jit(lambda a, b: fft_split(a, b, leaf=leaf))
    variants = [(xr + i * 1e-3, xi) for i in range(iters)]
    return slope_time(f, lambda i: variants[i % iters], iters=iters)


def tune_split_leaf(n: int, leaves=DEFAULT_LEAVES, batch: int = 4,
                    iters: int = 6, persist: bool = True) -> int:
    """Measure each candidate leaf for an n-point split FFT on the
    current device; record and return the winner."""
    from fftlab.algos.stockham import max_prime_factor

    best_leaf, best_t = None, float("inf")
    for leaf in leaves:
        if max_prime_factor(n) > leaf:
            continue
        try:
            dt = _measure_leaf(n, leaf, batch, iters)
        except Exception:
            continue
        if dt < best_t:
            best_leaf, best_t = leaf, dt
    if best_leaf is None:
        from fftlab.algos.split_stockham import DEFAULT_LEAF_SPLIT

        return DEFAULT_LEAF_SPLIT
    if persist:
        from fftlab.bench.timing import PROTOCOL

        wisdom.record(n, "f32", f"leaf={best_leaf}", best_t * 1e3,
                      kind="split", extra={"protocol": PROTOCOL})
    return best_leaf


def best_leaf(n: int) -> int:
    """Wisdom-recorded leaf for n, or the default."""
    from fftlab.algos.split_stockham import DEFAULT_LEAF_SPLIT

    cached = wisdom.lookup(n, "f32", kind="split")
    if cached and cached["algorithm"].startswith("leaf="):
        return int(cached["algorithm"].split("=", 1)[1])
    return DEFAULT_LEAF_SPLIT
