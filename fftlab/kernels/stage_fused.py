"""Per-stage fused Pallas kernel for the large-n MXU pipeline.

One launch = one Cooley-Tukey stage over the LEADING digit axis with the
inter-stage twiddle fused into the same VMEM residency — the XLA einsum
path materializes the stage output before the twiddle pass, costing an
extra HBM round trip per stage; this kernel writes the twiddled result
directly.

Layout contract per launch: x viewed as (B, r, M/128, 128) — contract
the r axis against F_r for every (column-block, lane); the twiddle
T[k, rest] multiplies elementwise with rest = (col*128 + lane) global
index. Blocks loop over column tiles with per-tile ref stores (no
concatenate — Mosaic-safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.twiddle import dft_matrix_np, stage_twiddle_np
from fftlab.core.types import Direction, FORWARD

_P = jax.lax.Precision.HIGHEST
LANES = 128


def _stage_kernel(xr_ref, xi_ref, Fr_ref, Fi_ref, twr_ref, twi_ref,
                  or_ref, oi_ref, *, cols: int, twiddle: bool):
    Fr = Fr_ref[...]
    Fi = Fi_ref[...]
    for t in range(cols):  # static unroll over column tiles
        ar = xr_ref[0, :, t, :]
        ai = xi_ref[0, :, t, :]
        yr = (jnp.dot(Fr, ar, precision=_P)
              - jnp.dot(Fi, ai, precision=_P))
        yi = (jnp.dot(Fr, ai, precision=_P)
              + jnp.dot(Fi, ar, precision=_P))
        if twiddle:
            wr = twr_ref[0, :, t, :]
            wi = twi_ref[0, :, t, :]
            or_ref[0, :, t, :] = yr * wr - yi * wi
            oi_ref[0, :, t, :] = yr * wi + yi * wr
        else:
            or_ref[0, :, t, :] = yr
            oi_ref[0, :, t, :] = yi


@functools.partial(
    jax.jit,
    static_argnames=("r", "direction", "twiddle", "col_tile", "interpret"),
)
def fused_stage(xr, xi, *, r: int, direction=FORWARD, twiddle: bool = True,
                col_tile: int = 8, interpret: bool = False):
    """One radix-r stage + fused twiddle over [B, n]: contracts the
    leading digit (stride n/r) and multiplies the stage twiddle, one HBM
    round trip total. Returns [B, n] in the stage's natural layout
    (k-major): out[k*M + rest]."""
    B, n = xr.shape
    M = n // r
    cols_total = M // LANES
    # Largest divisor of cols_total <= col_tile: a non-divisor tile count
    # would silently leave trailing column tiles unwritten (grid_c is a
    # floor division), returning uninitialized data.
    ct = min(col_tile, cols_total)
    while cols_total % ct:
        ct -= 1
    grid_c = cols_total // ct
    direction = Direction(int(direction))
    F = dft_matrix_np(r, direction)
    Fr = jnp.asarray(F.real.astype(xr.dtype))
    Fi = jnp.asarray(F.imag.astype(xr.dtype))
    if twiddle:
        tw = stage_twiddle_np(r, M, direction)  # (r, M)
        twr = jnp.asarray(tw.real.astype(xr.dtype)).reshape(1, r, cols_total, LANES)
        twi = jnp.asarray(tw.imag.astype(xr.dtype)).reshape(1, r, cols_total, LANES)
    else:
        twr = jnp.zeros((1, r, 1, LANES), xr.dtype)
        twi = twr
    x4r = xr.reshape(B, r, cols_total, LANES)
    x4i = xi.reshape(B, r, cols_total, LANES)

    blk = pl.BlockSpec((1, r, ct, LANES), lambda b, c: (b, 0, c, 0),
                       memory_space=pltpu.VMEM)
    twblk = (pl.BlockSpec((1, r, ct, LANES), lambda b, c: (0, 0, c, 0),
                          memory_space=pltpu.VMEM)
             if twiddle else
             pl.BlockSpec((1, r, 1, LANES), lambda b, c: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM))
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_stage_kernel, cols=ct, twiddle=twiddle),
        grid=(B, grid_c),
        in_specs=[blk, blk, const, const, twblk, twblk],
        out_specs=(blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct((B, r, cols_total, LANES), xr.dtype),
            jax.ShapeDtypeStruct((B, r, cols_total, LANES), xr.dtype),
        ),
        # Whole-call totals over the (B, grid_c) grid.
        cost_estimate=pl.CostEstimate(
            flops=8 * n * r * B, transcendentals=0,
            bytes_accessed=6 * 4 * n * B,
        ),
        interpret=interpret,
    )(x4r, x4i, Fr, Fi, twr, twi)
    return yr.reshape(B, n), yi.reshape(B, n)


def pipeline_factors(n: int) -> tuple[int, ...]:
    """Factorization of pow2 n that satisfies the fused-stage pipeline's
    column constraint: every non-leaf stage radix r must leave
    M = remaining//r divisible by 128 (lane width). Greedy largest-radix
    choice clamped by that bound; the leaf (last factor, consumed by the
    XLA matmul) is whatever <= 128 remains. plan_factors' balanced
    splits (e.g. (64, 32, 32) at 2^16) violate the bound — this is the
    chooser run_route and the compile gate must use."""
    if n < 2 * LANES or n & (n - 1):
        raise ValueError(f"pipeline needs pow2 n >= {2 * LANES}; got {n}")
    fs = []
    rem = n
    while rem > LANES:
        r = min(LANES, rem // LANES)
        fs.append(r)
        rem //= r
    fs.append(rem)
    return tuple(fs)


def fft_split_pipeline(xr, xi, direction=FORWARD, factors=(64, 128, 128),
                       col_tile: int = 8, interpret: bool = False):
    """Full FFT from fused-stage launches: K-1 Pallas stages (contraction
    + twiddle in one residency each), an XLA last-axis leaf matmul, and
    the digit-reversal transpose. Layout/twiddle math identical to
    algos/split_stockham (each produced digit folds into the batch)."""
    direction = Direction(int(direction))
    B, n = xr.shape
    assert int(np.prod(factors)) == n, (factors, n)
    rem = n
    bfold = B
    for r in factors[:-1]:
        if (rem // r) % LANES:
            raise ValueError(
                f"stage radix {r} leaves M={rem // r} columns; the fused "
                f"stage needs M % {LANES} == 0 — reorder factors "
                f"(small radices first)"
            )
        xr2 = xr.reshape(bfold, rem)
        xi2 = xi.reshape(bfold, rem)
        xr, xi = fused_stage(xr2, xi2, r=r, direction=direction,
                             twiddle=True, col_tile=col_tile,
                             interpret=interpret)
        bfold *= r
        rem //= r
    # Leaf: last-axis matmul via XLA (M == 1 territory for the kernel).
    r = factors[-1]
    F = dft_matrix_np(r, direction)
    Fr = jnp.asarray(F.real.astype(xr.dtype))
    Fi = jnp.asarray(F.imag.astype(xr.dtype))
    a_r = xr.reshape(bfold, r)
    a_i = xi.reshape(bfold, r)
    yr = (jnp.dot(a_r, Fr.T, precision=_P)
          - jnp.dot(a_i, Fi.T, precision=_P))
    yi = (jnp.dot(a_r, Fi.T, precision=_P)
          + jnp.dot(a_i, Fr.T, precision=_P))
    # Digit reversal.
    K = len(factors)
    yr = yr.reshape(B, *factors)
    yi = yi.reshape(B, *factors)
    perm = (0,) + tuple(range(K, 0, -1))
    yr = jnp.transpose(yr, perm).reshape(B, n)
    yi = jnp.transpose(yi, perm).reshape(B, n)
    if direction == Direction.INVERSE:
        s = jnp.asarray(1.0 / n, dtype=yr.dtype)
        return yr * s, yi * s
    return yr, yi
