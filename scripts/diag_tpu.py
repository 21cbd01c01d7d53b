"""Component-level timing of the split-Stockham 1M path on TPU: which
part of the pipeline eats the HBM passes?"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fftlab.core.twiddle import dft_matrix_np, stage_twiddle_np
from fftlab.core.types import Direction

P = jax.lax.Precision.HIGHEST


def bench(fn, args, iters=8):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def main():
    n = 1 << 20
    batch = 16
    r = 1024
    m = n // r
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    F = dft_matrix_np(r, Direction.FORWARD)
    Fr = jnp.asarray(F.real, jnp.float32)
    Fi = jnp.asarray(F.imag, jnp.float32)
    tw = stage_twiddle_np(r, m, Direction.FORWARD)
    twr = jnp.asarray(tw.real, jnp.float32)
    twi = jnp.asarray(tw.imag, jnp.float32)

    def stage2_only(xr, xi):
        a_r = xr.reshape(batch, r, m)
        a_i = xi.reshape(batch, r, m)
        # stage 1: contract axis -2 (middle)
        e = functools.partial(jnp.einsum, "...am,ba->...bm", precision=P)
        yr = e(a_r, Fr) - e(a_i, Fi)
        yi = e(a_r, Fi) + e(a_i, Fr)
        # twiddle
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr
        # stage 2: contract last axis
        e2 = functools.partial(jnp.einsum, "...ba,ca->...bc", precision=P)
        wr = e2(zr, Fr) - e2(zi, Fi)
        wi = e2(zr, Fi) + e2(zi, Fr)
        return wr, wi

    def full(xr, xi):
        wr, wi = stage2_only(xr, xi)
        # digit-reversal: transpose (b, k0, k1) -> (b, k1, k0), flatten
        return (jnp.swapaxes(wr, -1, -2).reshape(batch, n),
                jnp.swapaxes(wi, -1, -2).reshape(batch, n))

    def stage1_only(xr, xi):
        a_r = xr.reshape(batch, r, m)
        a_i = xi.reshape(batch, r, m)
        e = functools.partial(jnp.einsum, "...am,ba->...bm", precision=P)
        yr = e(a_r, Fr) - e(a_i, Fi)
        yi = e(a_r, Fi) + e(a_i, Fr)
        return yr, yi

    def stage1_lastaxis(xr, xi):
        # same contraction but operand pre-transposed so it's a clean
        # last-axis matmul: is the middle-axis einsum the problem?
        a_r = xr.reshape(batch, r, m).swapaxes(-1, -2)
        a_i = xi.reshape(batch, r, m).swapaxes(-1, -2)
        e = functools.partial(jnp.einsum, "...ma,ba->...mb", precision=P)
        yr = e(a_r, Fr) - e(a_i, Fi)
        yi = e(a_r, Fi) + e(a_i, Fr)
        return yr, yi

    def twiddle_only(xr, xi):
        a_r = xr.reshape(batch, r, m)
        a_i = xi.reshape(batch, r, m)
        zr = a_r * twr - a_i * twi
        zi = a_r * twi + a_i * twr
        return zr, zi

    def transpose_only(xr, xi):
        a_r = xr.reshape(batch, r, m)
        a_i = xi.reshape(batch, r, m)
        return (jnp.swapaxes(a_r, -1, -2).reshape(batch, n),
                jnp.swapaxes(a_i, -1, -2).reshape(batch, n))

    def single_big_matmul(xr, xi):
        # calibration: one (batch*m, r) @ (r, r) HIGHEST matmul pair
        a_r = xr.reshape(batch * m, r)
        a_i = xi.reshape(batch * m, r)
        yr = (jnp.dot(a_r, Fr.T, precision=P)
              - jnp.dot(a_i, Fi.T, precision=P))
        yi = (jnp.dot(a_r, Fi.T, precision=P)
              + jnp.dot(a_i, Fr.T, precision=P))
        return yr, yi

    for name, fn in [("full", full), ("stages_only", stage2_only),
                     ("stage1_middle", stage1_only),
                     ("stage1_lastaxis", stage1_lastaxis),
                     ("twiddle_only", twiddle_only),
                     ("transpose_only", transpose_only),
                     ("calib_big_matmul", single_big_matmul)]:
        dt = bench(jax.jit(fn), (xr, xi))
        print(f"{name:<18} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
