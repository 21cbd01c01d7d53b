"""Batch-major VPU radix-2 FFT kernel: butterflies on sublanes, one
independent transform per lane.

The MXU matmul formulation pays 8·r flops/point/stage and a 6-pass
precision tax for float32 accuracy; the classic radix-2 butterfly costs
10 flops/point/stage in NATIVE f32 on the VPU — 30× fewer flops for the
same transform. The catch on TPU is data layout: lane-crossing shuffles
are expensive, so this kernel puts the transform axis on SUBLANES and
the batch axis on LANES: every butterfly pairs two sublane rows, which
Mosaic handles as plain vector arithmetic; lanes never interact.

This is the direct TPU translation of the reference's hot loop
(radix2_dit.c:84-112) — but DIF-ordered, auto-sorting via the digit
pipeline, and 128 transforms wide per program.

Output rows are BIT-REVERSED (DIF); `vpu_fft_columns` un-permutes with
one XLA row-gather unless `bitrev_out=True`.

STATUS (round 2): interpret-verified but Mosaic hangs on the
reshape/concat stage structure, and probe work (scripts/probe_mosaic.py)
showed lane-axis `pltpu.roll` also hangs on this backend. The
speed-of-light role this kernel was designed for is now filled by the
MXU-contraction two-pass kernel (kernels/fourstep_vmem.py), which
compiles on hardware and beats the einsum path; this module remains as
the VPU-butterfly reference formulation.

Layout contract: x (B, L, 128) float32 — L the transform length
(pow2, 64..8192), lanes = 128 independent signals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftlab.core.types import Direction, FORWARD, is_power_of_two, log2_int

LANES = 128
MAX_L = 8192  # (L, 128) f32 x 2 planes x in/out ~ 16 MB VMEM at 8192


def _twiddle_pack_np(L: int, direction: Direction) -> np.ndarray:
    """All stage twiddles packed row-wise, lane-replicated: rows
    [off_i, off_i + post_i) hold W_{2*post_i}^{j} for DIF stage i
    (post_i = L >> (i+1)); total rows L-1, padded to L. complex128."""
    rows = np.zeros((L, 1), dtype=np.complex128)
    off = 0
    post = L >> 1
    while post >= 1:
        j = np.arange(post, dtype=np.float64)
        rows[off : off + post, 0] = np.exp(
            2j * np.pi * float(int(direction)) * j / (2.0 * post)
        )
        off += post
        post >>= 1
    return np.broadcast_to(rows, (L, LANES)).copy()


@functools.lru_cache(maxsize=None)
def bitrev_perm(L: int) -> np.ndarray:
    """Row permutation: natural[k] = bitrev_layout[perm[k]]."""
    bits = log2_int(L)
    idx = np.arange(L)
    rev = np.zeros(L, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _fft_stages(xr, xi, twr, twi, L: int):
    """The DIF stage pipeline on one (L, 128) block. Returns bit-reversed
    rows."""
    off = 0
    stages = log2_int(L)
    for i in range(stages):
        pre, post = 1 << i, L >> (i + 1)
        xr4 = xr.reshape(pre, 2, post, LANES)
        xi4 = xi.reshape(pre, 2, post, LANES)
        ar, br = xr4[:, 0], xr4[:, 1]
        ai, bi = xi4[:, 0], xi4[:, 1]
        dr, di = ar - br, ai - bi
        if post > 1:
            wr = twr[off : off + post].reshape(1, post, LANES)
            wi = twi[off : off + post].reshape(1, post, LANES)
            botr = dr * wr - di * wi
            boti = dr * wi + di * wr
        else:
            botr, boti = dr, di  # W_2^0 = 1
        xr = jnp.concatenate([ar + br, botr], axis=1).reshape(L, LANES)
        xi = jnp.concatenate([ai + bi, boti], axis=1).reshape(L, LANES)
        off += post
    return xr, xi


def _vpu_fft_kernel(xr_ref, xi_ref, twr_ref, twi_ref, or_ref, oi_ref,
                    *, L: int):
    yr, yi = _fft_stages(
        xr_ref[0], xi_ref[0], twr_ref[...], twi_ref[...], L
    )
    or_ref[0] = yr
    oi_ref[0] = yi


@functools.partial(
    jax.jit, static_argnames=("direction", "interpret", "bitrev_out")
)
def _vpu_fft_impl(xr, xi, *, direction: Direction, interpret: bool,
                  bitrev_out: bool):
    B, L, lanes = xr.shape
    tw = _twiddle_pack_np(L, direction)
    twr = jnp.asarray(tw.real.astype(xr.dtype))
    twi = jnp.asarray(tw.imag.astype(xr.dtype))
    blk = pl.BlockSpec((1, L, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_vpu_fft_kernel, L=L),
        grid=(B,),
        in_specs=[blk, blk, const, const],
        out_specs=(blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, LANES), xr.dtype),
            jax.ShapeDtypeStruct((B, L, LANES), xr.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * L * int(np.log2(L)) * LANES, transcendentals=0,
            bytes_accessed=4 * 4 * L * LANES,
        ),
        interpret=interpret,
    )(xr, xi, twr, twi)
    if not bitrev_out:
        perm = jnp.asarray(bitrev_perm(L))
        yr = yr[:, perm, :]
        yi = yi[:, perm, :]
    if direction == Direction.INVERSE:
        s = jnp.asarray(1.0 / L, dtype=yr.dtype)
        yr, yi = yr * s, yi * s
    return yr, yi


def vpu_fft_columns(xr, xi, direction=FORWARD, bitrev_out: bool = False,
                    interpret: bool | None = None):
    """Column FFTs: (B, L, 128) split planes -> (B, L, 128) spectra, one
    transform per lane along the L (sublane) axis.

    `bitrev_out=True` returns the raw DIF bit-reversed row order (for
    fused pipelines); default un-permutes to natural order with one
    gather. Forward unscaled / inverse 1/L."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    if xr.ndim != 3 or xr.shape[-1] != LANES:
        raise ValueError(
            f"expected (B, L, {LANES}) batch-major layout, got {xr.shape}"
        )
    L = int(xr.shape[1])
    if not is_power_of_two(L) or not (64 <= L <= MAX_L):
        raise ValueError(f"L must be a power of two in [64, {MAX_L}]; got {L}")
    return _vpu_fft_impl(
        xr, xi, direction=Direction(int(direction)),
        interpret=bool(interpret), bitrev_out=bool(bitrev_out),
    )
