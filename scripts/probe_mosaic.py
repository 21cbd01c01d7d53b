"""Probe which Mosaic lowerings compile + how fast on this TPU backend.

The round-1 VPU kernel (kernels/vpu_fft.py) hung Mosaic on its
reshape/concat stage structure. Before building the round-2 large-n
kernel, measure each candidate primitive in isolation:

  k-transpose   in-kernel jnp.transpose (L,128)->(128,L)
  k-subtr       sublane-axes transpose (32,32,128)->(1,0,2)
  k-roll-sub    pltpu.roll along sublanes (butterfly partner fetch)
  k-roll-lane   pltpu.roll along lanes
  k-rowperm     static bit-reversal row gather y[perm, :]
  x-copy        XLA elementwise pass (the bandwidth yardstick)
  x-transpose   XLA (B, L1, L2) -> (B, L2, L1)
  x-rowgather   XLA bitrev gather on axis -2
  x-bitrev2d    XLA combined transpose + double bitrev (the four-step
                output fixup done as ONE fused gather)

Each candidate runs under `timeout` upstream; a hang here means "do not
use that op". Timing = slope protocol (varying inputs, readback sync).

Run: timeout 600 python scripts/probe_mosaic.py [probe ...]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

LANES = 128


def slope_time(fn, mk_args, iters=6):
    """Per-call seconds via the two-point slope protocol (varying inputs,
    readback-forced completion) — see bench.py for why on this backend."""
    variants = [mk_args(i) for i in range(iters)]
    jax.block_until_ready(variants)
    out = fn(*variants[0])
    first = out[0] if isinstance(out, (tuple, list)) else out
    _ = np.asarray(first).ravel()[:1]

    def run(k):
        t0 = time.perf_counter()
        outs = [fn(*variants[i % iters]) for i in range(k)]
        last = outs[-1]
        first = last[0] if isinstance(last, (tuple, list)) else last
        _ = np.asarray(first).ravel()[:1]
        return time.perf_counter() - t0

    slopes = []
    for _ in range(3):
        k1, k2 = 2, iters
        slopes.append((run(k2) - run(k1)) / (k2 - k1))
    return float(np.median(slopes))


def report(name, dt, nbytes):
    gbps = nbytes / dt / 1e9
    print(f"{name:<14} {dt*1e3:9.3f} ms   {gbps:8.1f} GB/s (moved)",
          flush=True)


def mk_planes(shape, seed):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal(shape), jnp.float32),
            jnp.asarray(rng.standard_normal(shape), jnp.float32))


# -- Pallas probes (each on (B, L, 128) grid-over-B blocks) ---------------

def _pallas2(kernel, B, L, extra=()):
    blk = pl.BlockSpec((1, L, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[blk, blk],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((B, L, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, LANES), jnp.float32)),
    )


def probe_k_transpose(B=64, L=1024):
    def kern(ar, ai, or_, oi):
        # full 2D transpose then back (so shapes match the block)
        tr = jnp.transpose(ar[0], (1, 0))
        ti = jnp.transpose(ai[0], (1, 0))
        or_[0] = jnp.transpose(tr + 1.0, (1, 0))
        oi[0] = jnp.transpose(ti + 1.0, (1, 0))

    fn = jax.jit(lambda a, b: _pallas2(kern, B, L)(a, b))
    dt = slope_time(fn, lambda i: mk_planes((B, L, LANES), i))
    report("k-transpose", dt, 2 * 2 * 4 * B * L * LANES)


def probe_k_subtr(B=64, L=1024):
    def kern(ar, ai, or_, oi):
        a = ar[0].reshape(32, L // 32, LANES)
        b = ai[0].reshape(32, L // 32, LANES)
        or_[0] = jnp.transpose(a, (1, 0, 2)).reshape(L, LANES)
        oi[0] = jnp.transpose(b, (1, 0, 2)).reshape(L, LANES)

    fn = jax.jit(lambda a, b: _pallas2(kern, B, L)(a, b))
    dt = slope_time(fn, lambda i: mk_planes((B, L, LANES), i))
    report("k-subtr", dt, 2 * 2 * 4 * B * L * LANES)


def probe_k_roll_sub(B=64, L=1024):
    def kern(ar, ai, or_, oi):
        xr, xi = ar[0], ai[0]
        # 10 roll+select butterfly-ish stages along sublanes
        for s in range(10):
            d = L >> (s + 1)
            pr = pltpu.roll(xr, L - d, 0)   # out[i] = x[i+d]
            pi = pltpu.roll(xi, L - d, 0)
            qr = pltpu.roll(xr, d, 0)       # out[i] = x[i-d]
            qi = pltpu.roll(xi, d, 0)
            row = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
            mask = ((row // d) % 2).astype(jnp.bool_)
            xr = jnp.where(mask, qr - xr, xr + pr)
            xi = jnp.where(mask, qi - xi, xi + pi)
        or_[0] = xr
        oi[0] = xi

    fn = jax.jit(lambda a, b: _pallas2(kern, B, L)(a, b))
    dt = slope_time(fn, lambda i: mk_planes((B, L, LANES), i))
    report("k-roll-sub", dt, 2 * 2 * 4 * B * L * LANES)


def probe_k_roll_lane(B=64, L=1024):
    def kern(ar, ai, or_, oi):
        xr, xi = ar[0], ai[0]
        for s in range(7):
            d = 128 >> (s + 1)
            pr = pltpu.roll(xr, LANES - d, 1)
            pi = pltpu.roll(xi, LANES - d, 1)
            qr = pltpu.roll(xr, d, 1)
            qi = pltpu.roll(xi, d, 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            mask = ((col // d) % 2).astype(jnp.bool_)
            xr = jnp.where(mask, qr - xr, xr + pr)
            xi = jnp.where(mask, qi - xi, xi + pi)
        or_[0] = xr
        oi[0] = xi

    fn = jax.jit(lambda a, b: _pallas2(kern, B, L)(a, b))
    dt = slope_time(fn, lambda i: mk_planes((B, L, LANES), i))
    report("k-roll-lane", dt, 2 * 2 * 4 * B * L * LANES)


def probe_k_rowperm(B=64, L=1024):
    """Bit-reversal row permutation via one-hot MXU matmul (P @ x) —
    the realistic in-kernel fallback if sublane gathers are unsupported."""
    rev = _bitrev(L)
    P = np.zeros((L, L), np.float32)
    P[np.arange(L), rev] = 1.0
    Pj = jnp.asarray(P)

    def kern(p_ref, ar, ai, or_, oi):
        or_[0] = jnp.dot(p_ref[...], ar[0],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        oi[0] = jnp.dot(p_ref[...], ai[0],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

    blk = pl.BlockSpec((1, L, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[const, blk, blk],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((B, L, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, L, LANES), jnp.float32)),
    )
    fn = jax.jit(lambda a, b: call(Pj, a, b))
    dt = slope_time(fn, lambda i: mk_planes((B, L, LANES), i))
    report("k-rowperm", dt, 2 * 2 * 4 * B * L * LANES)


# -- XLA pass probes at the bench shape -----------------------------------

def _xla_probe(name, op, B=16, L1=1024, L2=1024):
    fn = jax.jit(op)
    dt = slope_time(fn, lambda i: mk_planes((B, L1, L2), i))
    report(name, dt, 2 * 2 * 4 * B * L1 * L2)


def probe_x_copy():
    _xla_probe("x-copy", lambda a, b: (a + 1.0, b + 1.0))


def probe_x_transpose():
    _xla_probe("x-transpose",
               lambda a, b: (jnp.swapaxes(a, -1, -2).copy(),
                             jnp.swapaxes(b, -1, -2).copy()))


def _bitrev(L):
    bits = int(np.log2(L))
    idx = np.arange(L)
    rev = np.zeros(L, np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def probe_x_rowgather():
    perm = jnp.asarray(_bitrev(1024))
    _xla_probe("x-rowgather",
               lambda a, b: (a[:, perm, :], b[:, perm, :]))


def probe_x_bitrev2d():
    perm = jnp.asarray(_bitrev(1024))

    def op(a, b):
        # out[b, k2, k1] = y[b, rev(k2), rev(k1)] composed w/ transpose
        return (jnp.swapaxes(a[:, perm, :][:, :, perm], -1, -2).copy(),
                jnp.swapaxes(b[:, perm, :][:, :, perm], -1, -2).copy())

    _xla_probe("x-bitrev2d", op)


PROBES = {
    "x-copy": probe_x_copy,
    "x-transpose": probe_x_transpose,
    "x-rowgather": probe_x_rowgather,
    "x-bitrev2d": probe_x_bitrev2d,
    "k-roll-sub": probe_k_roll_sub,
    "k-roll-lane": probe_k_roll_lane,
    "k-transpose": probe_k_transpose,
    "k-subtr": probe_k_subtr,
    "k-rowperm": probe_k_rowperm,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    for n in names:
        t0 = time.perf_counter()
        try:
            PROBES[n]()
        except Exception as e:
            print(f"{n:<14} FAILED: {str(e)[:120]}", flush=True)
        print(f"  [{n} wall {time.perf_counter()-t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
