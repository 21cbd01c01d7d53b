"""Probe which Mosaic lowerings compile + how fast on this TPU backend.

The round-1 VPU kernel (removed in round 3; see docs/performance.md
"VPU butterfly kernel" negative result) hung Mosaic on its
reshape/concat stage structure. Before building the round-2 large-n
kernel, measure each candidate primitive in isolation:

  k-transpose   in-kernel jnp.transpose (L,128)->(128,L)
  k-subtr       sublane-axes transpose (32, L/32, 128)->(1,0,2)
  k-roll-sub    pltpu.roll butterfly stages along sublanes
  k-roll-lane   pltpu.roll butterfly stages along lanes
  k-rowperm     bit-reversal row permutation via one-hot MXU matmul
  x-copy        XLA elementwise pass (the bandwidth yardstick)
  x-transpose   XLA (B, L1, L2) -> (B, L2, L1)
  x-rowgather   XLA bitrev gather on axis -2
  x-bitrev2d    XLA combined transpose + double bitrev (the four-step
                output fixup done as ONE fused gather)

Timing = chain_time (fftlab/bench/timing.py): k applications chained
inside one jitted fori_loop -> one dispatch+readback per measurement;
slope over two k values cancels the fixed cost. This is the only
protocol that survives this tunnel's multi-hundred-ms dispatch jitter.

Each candidate runs under `timeout` upstream; a hang means "do not use
that op".  Run: timeout 900 python scripts/probe_mosaic.py [probe ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from fftlab.bench.timing import chain_time  # noqa: E402

LANES = 128
KS = (4, 128)
REPEATS = 5


def report(name, dt, nbytes):
    gbps = nbytes / dt / 1e9
    print(f"{name:<14} {dt*1e3:9.3f} ms/app  {gbps:8.1f} GB/s (moved)",
          flush=True)


_BASE = {}


def mk_planes(shape, seed):
    """Per-repeat variants derived ON DEVICE from one uploaded base pair
    (host->device transfers over this tunnel cost seconds per 100 MB and
    were polluting the timing)."""
    if shape not in _BASE:
        rng = np.random.default_rng(0)
        _BASE[shape] = (
            jnp.asarray(rng.standard_normal(shape), jnp.float32),
            jnp.asarray(rng.standard_normal(shape), jnp.float32),
        )
    br, bi = _BASE[shape]
    t = jnp.float32(1e-3 * seed)
    return (br + t, bi - t)


def _bitrev(L):
    bits = int(np.log2(L))
    idx = np.arange(L)
    rev = np.zeros(L, np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


# -- Pallas probes (each on (B, L, 128) grid-over-B blocks) ---------------

def _pallas2(kernel, B, L):
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
        tr = jnp.transpose(ar[0], (1, 0))
        ti = jnp.transpose(ai[0], (1, 0))
        or_[0] = jnp.transpose(tr + 1.0, (1, 0))
        oi[0] = jnp.transpose(ti + 1.0, (1, 0))

    step = _pallas2(kern, B, L)
    dt = chain_time(step, lambda i: mk_planes((B, L, LANES), i), KS, REPEATS)
    report("k-transpose", dt, 2 * 2 * 4 * B * L * LANES)


def probe_k_subtr(B=64, L=1024):
    def kern(ar, ai, or_, oi):
        a = ar[0].reshape(32, L // 32, LANES)
        b = ai[0].reshape(32, L // 32, LANES)
        or_[0] = jnp.transpose(a, (1, 0, 2)).reshape(L, LANES) + 1.0
        oi[0] = jnp.transpose(b, (1, 0, 2)).reshape(L, LANES) + 1.0

    step = _pallas2(kern, B, L)
    dt = chain_time(step, lambda i: mk_planes((B, L, LANES), i), KS, REPEATS)
    report("k-subtr", dt, 2 * 2 * 4 * B * L * LANES)


def probe_k_roll_sub(B=64, L=1024):
    def kern(ar, ai, or_, oi):
        xr, xi = ar[0], ai[0]
        for s in range(10):  # 10 butterfly-ish stages along sublanes
            d = L >> (s + 1)
            pr = pltpu.roll(xr, L - d, 0)   # out[i] = x[i+d]
            pi = pltpu.roll(xi, L - d, 0)
            qr = pltpu.roll(xr, d, 0)       # out[i] = x[i-d]
            qi = pltpu.roll(xi, d, 0)
            row = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
            mask = ((row // d) % 2) == 1
            xr = jnp.where(mask, qr - xr, xr + pr)
            xi = jnp.where(mask, qi - xi, xi + pi)
        or_[0] = xr
        oi[0] = xi

    step = _pallas2(kern, B, L)
    dt = chain_time(step, lambda i: mk_planes((B, L, LANES), i), KS, REPEATS)
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
            mask = ((col // d) % 2) == 1
            xr = jnp.where(mask, qr - xr, xr + pr)
            xi = jnp.where(mask, qi - xi, xi + pi)
        or_[0] = xr
        oi[0] = xi

    step = _pallas2(kern, B, L)
    dt = chain_time(step, lambda i: mk_planes((B, L, LANES), i), KS, REPEATS)
    report("k-roll-lane", dt, 2 * 2 * 4 * B * L * LANES)


def probe_k_rowperm(B=64, L=1024):
    """Bit-reversal row permutation via one-hot MXU matmul (P @ x)."""
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
    step = lambda a, b: call(Pj, a, b)
    dt = chain_time(step, lambda i: mk_planes((B, L, LANES), i), KS, REPEATS)
    report("k-rowperm", dt, 2 * 2 * 4 * B * L * LANES)


# -- XLA pass probes at the bench shape -----------------------------------

def _xla_probe(name, op, B=16, L1=1024, L2=1024):
    dt = chain_time(op, lambda i: mk_planes((B, L1, L2), i), KS, REPEATS)
    report(name, dt, 2 * 2 * 4 * B * L1 * L2)


def probe_x_copy():
    _xla_probe("x-copy", lambda a, b: (a + 1.0, b + 1.0))


def probe_x_transpose():
    _xla_probe("x-transpose",
               lambda a, b: (jnp.swapaxes(a, -1, -2) + 1.0,
                             jnp.swapaxes(b, -1, -2) + 1.0))


def probe_x_rowgather():
    perm = jnp.asarray(_bitrev(1024))
    _xla_probe("x-rowgather",
               lambda a, b: (a[:, perm, :] + 1.0, b[:, perm, :] + 1.0))


def probe_x_bitrev2d():
    perm = jnp.asarray(_bitrev(1024))

    def op(a, b):
        # out[b, k2, k1] = y[b, rev(k2), rev(k1)] composed w/ transpose
        return (jnp.swapaxes(a[:, perm, :][:, :, perm], -1, -2) + 1.0,
                jnp.swapaxes(b[:, perm, :][:, :, perm], -1, -2) + 1.0)

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
