"""TPU tuning sweep for the split-Stockham fast path.

Measures throughput of design variants on the real chip:
- leaf size (stage radix): 64 / 128 / 256 / 512 / 1024
- matmul precision: HIGHEST (bf16_6x) vs HIGH (bf16_3x) + SNR impact
- packed complex contraction (one 2r x 2r real matmul) vs 4 separate

Run: python scripts/tune_tpu.py [n] [batch]
"""

from __future__ import annotations

import functools
import string
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fftlab.algos.stockham import plan_factors
from fftlab.core.twiddle import dft_matrix_np, stage_twiddle_np
from fftlab.core.types import Direction


def bench(fn, args, iters=8):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def split_fft_variant(xr, xi, n, leaf, precision, packed):
    factors = plan_factors(n, leaf)
    K = len(factors)
    batch = xr.shape[:-1]
    bnd = len(batch)
    xr = xr.reshape(*batch, *factors)
    xi = xi.reshape(*batch, *factors)
    rem = n
    d = Direction.FORWARD
    for i, r in enumerate(factors):
        F = dft_matrix_np(r, d)
        ax = K - 1 - i
        if ax == 0:
            eq = "...a,ba->...b"
        else:
            tail = string.ascii_lowercase[2 : 2 + ax]
            eq = f"...a{tail},ba->...b{tail}"
        if packed:
            # one real matmul on stacked [re; im] along the digit axis:
            # G = [[Fr^T, Fi^T], [-Fi^T, Fr^T]] acting on concat(re, im).
            Fr, Fi = F.real, F.imag
            G = np.block([[Fr, -Fi], [Fi, Fr]])  # (2r, 2r) rows=out, cols=in
            x2 = jnp.concatenate([xr, xi], axis=bnd + i)  # stack on digit ax
            y2 = jnp.einsum(eq, x2, jnp.asarray(G.astype(xr.dtype)),
                            precision=precision)
            xr2, xi2 = jnp.split(y2, 2, axis=bnd + i)
            xr, xi = xr2, xi2
        else:
            Fr = jnp.asarray(F.real.astype(xr.dtype))
            Fi = jnp.asarray(F.imag.astype(xr.dtype))
            ein = functools.partial(jnp.einsum, eq, precision=precision)
            yr = ein(xr, Fr) - ein(xi, Fi)
            yi = ein(xr, Fi) + ein(xi, Fr)
            xr, xi = yr, yi
        if i < K - 1:
            m = rem // r
            tw = stage_twiddle_np(r, m, d).reshape(r, *factors[i + 1 :])
            twr = jnp.asarray(tw.real.astype(xr.dtype))
            twi = jnp.asarray(tw.imag.astype(xr.dtype))
            xr, xi = xr * twr - xi * twi, xr * twi + xi * twr
            rem = m
    perm = tuple(range(bnd)) + tuple(range(bnd + K - 1, bnd - 1, -1))
    xr = jnp.transpose(xr, perm).reshape(*batch, n)
    xi = jnp.transpose(xi, perm).reshape(*batch, n)
    return xr, xi


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    want = np.fft.fft(
        np.asarray(xr[0], np.float64) + 1j * np.asarray(xi[0], np.float64)
    )
    P = jax.lax.Precision
    results = []
    for leaf in (64, 128, 256, 512, 1024):
        for prec, pname in ((P.HIGHEST, "HIGHEST"), (P.HIGH, "HIGH")):
            for packed in (False, True):
                try:
                    fn = jax.jit(functools.partial(
                        split_fft_variant, n=n, leaf=leaf,
                        precision=prec, packed=packed,
                    ))
                    yr, yi = fn(xr[:1], xi[:1])
                    got = (np.asarray(yr[0], np.float64)
                           + 1j * np.asarray(yi[0], np.float64))
                    snr = 10 * np.log10(
                        np.sum(np.abs(want) ** 2)
                        / max(np.sum(np.abs(got - want) ** 2), 1e-300)
                    )
                    dt = bench(fn, (xr, xi))
                    gsps = batch * n / dt / 1e9
                    tag = f"leaf={leaf:<5} prec={pname:<8} packed={int(packed)}"
                    print(f"{tag}  {dt*1e3:8.3f} ms  {gsps:6.2f} GS/s  "
                          f"SNR {snr:6.1f} dB", flush=True)
                    results.append((gsps, snr, tag))
                except Exception as e:
                    print(f"leaf={leaf} prec={pname} packed={packed} "
                          f"FAILED: {str(e)[:80]}", flush=True)
    results.sort(reverse=True)
    print("\nbest:", results[0] if results else None)


if __name__ == "__main__":
    main()
