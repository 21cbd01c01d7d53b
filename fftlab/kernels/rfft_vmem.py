"""Pallas r2c prologue/epilogue: the pack-two-reals deinterleave and
the Hermitian unpack as bandwidth-bound MXU kernels.

Why: the r3 rfft probe (bench_artifacts/rfft_probe.jsonl) measured the
XLA formulations of both steps as LANE-GATHER class on this TPU —
deinterleave x[..., 0::2] at 18-98 ms and the paired unpack at ~47 ms
for 8 x 2M, against a ~0.5 ms copy floor — swamping the half-size FFT
itself (~8 ms same window). Every lane-crossing operation here is
expressed as a PERMUTATION MATMUL instead (0/1 matrices are EXACT at
HIGHEST precision: v*1.0 survives the bf16 passes unchanged):

  pack      x (B, n) -> even/odd planes (B, m): two (256 -> 128)
            selection matmuls per block; inverse = transposed.
  unpack    Z (B, m) -> X bins 0..m-1 via X[k] = E + W*O with
            conj(Z[(m-k) % m]) assembled from
              - BLOCK-index mirror: BlockSpec index map (free)
              - within-block tile reversal: (TB, TB) exchange matmul
              - within-tile lane reversal (l>=1): (128, 128) shifted
                exchange matmul
              - the l=0 straggler column: (TB, TB) shift matmul plus
                one scalar from the wrap block
            Bin m (= E[0] - O[0]) is appended by the XLA caller.

Reference anchor: the r2c path the reference declared but never
shipped (fft_auto.c:391-403 use-after-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_P = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_P, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# pack: deinterleave x into even/odd planes (and the inverse interleave)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sel_matrices():
    """(256, 128) 0/1 selectors: Se picks even lanes, So odd."""
    Se = np.zeros((2 * LANES, LANES), np.float32)
    So = np.zeros((2 * LANES, LANES), np.float32)
    for j in range(LANES):
        Se[2 * j, j] = 1.0
        So[2 * j + 1, j] = 1.0
    return Se, So


def _pack_kernel(x_blk, Se, So, zr_ref, zi_ref):
    x = x_blk[0]
    zr_ref[0] = _dot(x, Se[...])
    zi_ref[0] = _dot(x, So[...])


def _unpack_kernel(zr_blk, zi_blk, Se, So, x_ref):
    x_ref[0] = (_dot(zr_blk[0], Se[...].T) + _dot(zi_blk[0], So[...].T))


def pack_supported(n: int, tb: int = 256) -> bool:
    m = n // 2
    return n % 2 == 0 and m % (LANES * 8) == 0


def _rows_tb(rows: int, tb: int) -> int:
    tb = min(tb, rows)
    while rows % tb:
        tb //= 2
    return max(tb, 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pack_impl(x, *, interpret: bool):
    B, n = x.shape
    m = n // 2
    rows = m // LANES
    tb = _rows_tb(rows, 256)
    Se, So = _sel_matrices()
    Se = jnp.asarray(Se)
    So = jnp.asarray(So)
    x3 = x.reshape(B, rows, 2 * LANES)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk_in = pl.BlockSpec((1, tb, 2 * LANES), lambda b, p: (b, p, 0),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((1, tb, LANES), lambda b, p: (b, p, 0),
                           memory_space=pltpu.VMEM)
    zr, zi = pl.pallas_call(
        _pack_kernel,
        grid=(B, rows // tb),
        in_specs=[blk_in, const, const],
        out_specs=(blk_out, blk_out),
        out_shape=(jax.ShapeDtypeStruct((B, rows, LANES), x.dtype),
                   jax.ShapeDtypeStruct((B, rows, LANES), x.dtype)),
        interpret=interpret,
    )(x3, Se, So)
    return zr.reshape(B, m), zi.reshape(B, m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _interleave_impl(zr, zi, *, interpret: bool):
    B, m = zr.shape
    rows = m // LANES
    tb = _rows_tb(rows, 256)
    Se, So = _sel_matrices()
    Se = jnp.asarray(Se)
    So = jnp.asarray(So)
    z3r = zr.reshape(B, rows, LANES)
    z3i = zi.reshape(B, rows, LANES)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk_in = pl.BlockSpec((1, tb, LANES), lambda b, p: (b, p, 0),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((1, tb, 2 * LANES), lambda b, p: (b, p, 0),
                           memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        _unpack_kernel,
        grid=(B, rows // tb),
        in_specs=[blk_in, blk_in, const, const],
        out_specs=blk_out,
        out_shape=jax.ShapeDtypeStruct((B, rows, 2 * LANES), zr.dtype),
        interpret=interpret,
    )(z3r, z3i, Se, So)
    return x.reshape(B, 2 * m)


def pallas_pack_real(x, interpret: bool | None = None):
    """x real [..., n] -> (even, odd) planes [..., n//2]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(x, jnp.float32)
    batch = x.shape[:-1]
    n = int(x.shape[-1])
    if not pack_supported(n):
        raise ValueError(f"pack needs n/2 % {LANES * 8} == 0; got n={n}")
    B = 1
    for d in batch:
        B *= int(d)
    zr, zi = _pack_impl(x.reshape(B, n), interpret=bool(interpret))
    return zr.reshape(*batch, n // 2), zi.reshape(*batch, n // 2)


def pallas_interleave(zr, zi, interpret: bool | None = None):
    """(even, odd) planes [..., m] -> real [..., 2m] (pack inverse)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    zr = jnp.asarray(zr, jnp.float32)
    zi = jnp.asarray(zi, jnp.float32)
    batch = zr.shape[:-1]
    m = int(zr.shape[-1])
    if not pack_supported(2 * m):
        raise ValueError(f"interleave needs m % {LANES * 8} == 0; got {m}")
    B = 1
    for d in batch:
        B *= int(d)
    x = _interleave_impl(zr.reshape(B, m), zi.reshape(B, m),
                         interpret=bool(interpret))
    return x.reshape(*batch, 2 * m)


# ---------------------------------------------------------------------------
# Hermitian unpack: X[k] = E_k + W_k * O_k for k = 0..m-1
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mirror_matrices(tb: int):
    """Exchange/shift matrices for the conj-mirror assembly.

    Prev (tb, tb): row reversal (tile order within a block).
    E1 (128, 128): lane map l -> 128-l for l >= 1 (column 0 zero).
    S1 (tb, tb):   shift rows down by one (row 0 zero).
    e0r (1, 128):  basis row for the straggler column placement.
    """
    Prev = np.eye(tb, dtype=np.float32)[::-1].copy()
    E1 = np.zeros((LANES, LANES), np.float32)
    for l in range(1, LANES):
        E1[LANES - l, l] = 1.0
    S1 = np.zeros((tb, tb), np.float32)
    for i in range(1, tb):
        S1[i, i - 1] = 1.0
    e0r = np.zeros((1, LANES), np.float32)
    e0r[0, 0] = 1.0
    e0c = np.zeros((tb, 1), np.float32)
    e0c[0, 0] = 1.0
    return Prev, E1, S1, e0r, e0c


def _mirror_plane(z, zp, Prev, E1, S1, e0r, e0c):
    """conj-mirror value assembly for ONE plane: given the mirror block
    z (rows ascending tile order) and the wrap block zp, return
    Zh[i, l] = Z[(m - k) % m] for the natural block's (i, l)."""
    mainrev = _dot(Prev, z)              # row i = tile T-1-t0-i
    lanes = _dot(mainrev, E1)            # l >= 1 part
    strag = _dot(S1, mainrev[:, :1])     # rows shifted down
    strag = strag + e0c * zp[0, 0]       # row 0 <- wrap block tile 0
    return lanes + _dot(strag, e0r)


def _herm_kernel(zr_blk, zi_blk, mr_blk, mi_blk, pr_blk, pi_blk,
                 wr_blk, wi_blk, Prev, E1, S1, e0r, e0c,
                 xr_ref, xi_ref):
    Zlr, Zli = zr_blk[0], zi_blk[0]
    args = (Prev[...], E1[...], S1[...], e0r[...], e0c[...])
    Zhr = _mirror_plane(mr_blk[0], pr_blk[0], *args)
    Zhi = _mirror_plane(mi_blk[0], pi_blk[0], *args)
    Er = 0.5 * (Zlr + Zhr)
    Ei = 0.5 * (Zli - Zhi)
    Or_ = 0.5 * (Zli + Zhi)
    Oi = -0.5 * (Zlr - Zhr)
    wr, wi = wr_blk[0], wi_blk[0]
    xr_ref[0] = Er + (Or_ * wr - Oi * wi)
    xi_ref[0] = Ei + (Or_ * wi + Oi * wr)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _herm_unpack_impl(zr, zi, *, n: int, interpret: bool):
    B, m = zr.shape
    rows = m // LANES
    tb = _rows_tb(rows, 256)
    P = rows // tb
    Prev, E1, S1, e0r, e0c = _mirror_matrices(tb)
    consts = [jnp.asarray(Prev), jnp.asarray(E1), jnp.asarray(S1),
              jnp.asarray(e0r), jnp.asarray(e0c)]
    k = np.arange(m, dtype=np.float64)
    w = np.exp(-2j * np.pi * k / n)
    wr = jnp.asarray(w.real.astype(np.float32)).reshape(1, rows, LANES)
    wi = jnp.asarray(w.imag.astype(np.float32)).reshape(1, rows, LANES)
    z3r = zr.reshape(B, rows, LANES)
    z3i = zi.reshape(B, rows, LANES)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    nat = pl.BlockSpec((1, tb, LANES), lambda b, p: (b, p, 0),
                       memory_space=pltpu.VMEM)
    mir = pl.BlockSpec((1, tb, LANES), lambda b, p: (b, P - 1 - p, 0),
                       memory_space=pltpu.VMEM)
    wrp = pl.BlockSpec((1, tb, LANES), lambda b, p: (b, (P - p) % P, 0),
                       memory_space=pltpu.VMEM)
    wnat = pl.BlockSpec((1, tb, LANES), lambda b, p: (0, p, 0),
                        memory_space=pltpu.VMEM)
    xr, xi = pl.pallas_call(
        _herm_kernel,
        grid=(B, P),
        in_specs=[nat, nat, mir, mir, wrp, wrp, wnat, wnat]
                 + [const] * 5,
        out_specs=(nat, nat),
        out_shape=(jax.ShapeDtypeStruct((B, rows, LANES), zr.dtype),
                   jax.ShapeDtypeStruct((B, rows, LANES), zr.dtype)),
        interpret=interpret,
    )(z3r, z3i, z3r, z3i, z3r, z3i, wr, wi, *consts)
    return xr.reshape(B, m), xi.reshape(B, m)


def pallas_hermitian_unpack(zr, zi, n: int, interpret: bool | None = None):
    """Half-size spectrum Z [..., m] -> one-sided X bins 0..m (m = n/2).

    Bin m (Nyquist, = Re(Z[0]) - Im(Z[0])) is appended here in XLA —
    one scalar per batch row."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    zr = jnp.asarray(zr, jnp.float32)
    zi = jnp.asarray(zi, jnp.float32)
    batch = zr.shape[:-1]
    m = int(zr.shape[-1])
    if n != 2 * m:
        raise ValueError(f"n must be 2*m; got n={n}, m={m}")
    if not pack_supported(n):
        raise ValueError(f"unpack needs m % {LANES * 8} == 0; got {m}")
    B = 1
    for d in batch:
        B *= int(d)
    xr, xi = _herm_unpack_impl(zr.reshape(B, m), zi.reshape(B, m),
                               n=n, interpret=bool(interpret))
    nyq_r = (zr.reshape(B, m)[:, :1] - zi.reshape(B, m)[:, :1])
    xr = jnp.concatenate([xr, nyq_r], axis=-1)
    xi = jnp.concatenate([xi, jnp.zeros_like(nyq_r)], axis=-1)
    h = m + 1
    return xr.reshape(*batch, h), xi.reshape(*batch, h)
