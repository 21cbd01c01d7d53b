"""Phase-isolation diagnostic for the one-residency kernel's measured
slowness (r3 counted A/B: resident 32-75 ms vs fourstep_blocked 4.8-6.7
for 16x1M — >2x worse than the pass it saves should allow).

Five stripped kernels share the v2 structure (same grid geometry, same
BlockSpecs, same tables) but run exactly one cost component each, so
timing them decomposes the full kernel's time:

  read_only    phase-A grid, in_blk -> scratch copy (strided HBM read)
  phase_a      read + in-VMEM column FFT + rank-1 twiddle into scratch
  write_only   phase-B grid, scratch chunk -> out_blk copy (strided
               HBM write)
  phase_b_not  write + length-L2 column FFT, NO assembly transposes
  phase_b      write + 8 dynamic-slice transposes + column FFT (the
               real phase B)

full-kernel time ~ phase_a + phase_b; the deltas attribute it:
  phase_a - read_only          = pass-1 compute
  phase_b - phase_b_not        = the transpose assembly
  phase_b_not - write_only     = pass-2 compute

Appends to bench_artifacts/resident_diag.jsonl. Run on the TPU in a
healthy window (health-gated the same way as the A/B).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

cache = os.path.expanduser("~/.cache/jax_comp")
os.makedirs(cache, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from fftlab.core.types import Direction, FORWARD  # noqa: E402
from fftlab.kernels.fourstep_vmem import (  # noqa: E402
    LANES,
    _col_fft_tables,
    _col_fft_vmem,
    _rank1_twiddle_np,
    _split_factors,
    _split_sides,
)

ART = "bench_artifacts/resident_diag.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def _mk_variant(variant: str, B: int, n: int, interpret: bool):
    """Build one stripped pallas_call mirroring resident_vmem v2."""
    L1, L2 = _split_sides(n)
    W = LANES
    R = min(LANES, L1)
    C2 = L2 // W
    G1 = L1 // R
    fa1, fb1 = _split_factors(L1)
    fa2, fb2 = _split_factors(L2)
    tabs1 = _col_fft_tables(L1, Direction.FORWARD)
    tabs2 = _col_fft_tables(L2, Direction.FORWARD)
    A, P = _rank1_twiddle_np(L1, L2, W, Direction.FORWARD)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))
    Pi = jnp.asarray(P.imag.astype(np.float32))
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    dt = jnp.float32

    a_grid = variant in ("read_only", "phase_a")
    steps = C2 if a_grid else G1

    def kernel(xr_blk, xi_blk, Far1, Fai1, Fbr1, Fbi1, twr1, twi1,
               Far2, Fai2, Fbr2, Fbi2, twr2, twi2, ar_blk, ai_blk,
               PrT, PiT, or_ref, oi_ref, Mbr, Mbi, T2r, T2i):
        s = pl.program_id(1)
        if variant == "read_only":
            Mbr[s] = xr_blk[0]
            Mbi[s] = xi_blk[0]
            or_ref[0] = Mbr[s]
            oi_ref[0] = Mbi[s]
        elif variant == "phase_a":
            tabs1k = (Far1[...], Fai1[...], Fbr1[...], Fbi1[...],
                      twr1[...], twi1[...])
            yr, yi = _col_fft_vmem(xr_blk[0], xi_blk[0], tabs1k, fa1, fb1)
            ar = ar_blk[0]
            ai = ai_blk[0]
            wr = ar * PrT[...] - ai * PiT[...]
            wi = ar * PiT[...] + ai * PrT[...]
            Mbr[s] = yr * wr - yi * wi
            Mbi[s] = yr * wi + yi * wr
            or_ref[0] = Mbr[s]
            oi_ref[0] = Mbi[s]
        else:
            g = s
            if variant == "write_only":
                # scratch chunk -> out, no compute (garbage data is fine
                # for timing; nothing here can trap)
                or_ref[0] = Mbr[g % C2][:, :R] * 1.000001
                oi_ref[0] = Mbi[g % C2][:, :R] * 1.000001
                return
            if variant == "phase_b":
                for c in range(C2):
                    rs = pl.ds(g * R, R)
                    ls = slice(c * W, (c + 1) * W)
                    T2r[ls, :] = jnp.transpose(Mbr[c, rs, :], (1, 0))
                    T2i[ls, :] = jnp.transpose(Mbi[c, rs, :], (1, 0))
                xr2, xi2 = T2r[...], T2i[...]
            else:  # phase_b_not: skip the transposes
                xr2, xi2 = Mbr[g % C2][:, :R], Mbi[g % C2][:, :R]
            tabs2k = (Far2[...], Fai2[...], Fbr2[...], Fbi2[...],
                      twr2[...], twi2[...])
            yr, yi = _col_fft_vmem(xr2, xi2, tabs2k, fa2, fb2)
            or_ref[0] = yr
            oi_ref[0] = yi

    in_blk = pl.BlockSpec(
        (1, L1, W),
        (lambda b, s: (b, 0, jnp.minimum(s, C2 - 1))) if a_grid
        else (lambda b, s: (b, 0, 0)),
        memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec(
        (1, L1, 1),
        lambda b, s: (jnp.minimum(s, C2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    if a_grid:
        # phase-A variants write (L1, W) chunks at a parked column 0 —
        # a 1/C2-sized output so the strided-read cost dominates
        out_shape = (B, L1, W)
        out_blk = pl.BlockSpec((1, L1, W), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        out_shape = (B, L2, L1)
        out_blk = pl.BlockSpec((1, L2, R), lambda b, s: (b, 0, s),
                               memory_space=pltpu.VMEM)

    grid = (B, steps)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_blk, in_blk] + [const] * 12 + [a_blk, a_blk,
                                                    const, const],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct(out_shape, dt),
                   jax.ShapeDtypeStruct(out_shape, dt)),
        scratch_shapes=[
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((C2, L1, W), dt),
            pltpu.VMEM((L2, R), dt),
            pltpu.VMEM((L2, R), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(xr, xi):
        # chain_time chains run(run(x)) in a fori_loop, so the step must
        # be SHAPE-PRESERVING: carry the inputs forward with an
        # epsilon-coupled full reduction of the kernel outputs (keeps
        # the kernel live in every iteration; same trick as bench.py's
        # rfft chain).
        x3r = xr.reshape(B, L1, L2)
        x3i = xi.reshape(B, L1, L2)
        yr, yi = f(x3r, x3i, *tabs1, *tabs2, Ar, Ai, Pr, Pi)
        # A scalar coupling is enough: a pallas_call is opaque to XLA,
        # so the kernel can't be pruned or slice-propagated — and unlike
        # a full jnp.sum it adds no extra HBM pass over the output.
        eps = jnp.float32(1e-30)
        return (xr + eps * yr[0, 0, 0], xi + eps * yi[0, 0, 0])

    return jax.jit(run)


VARIANTS = ("read_only", "phase_a", "write_only", "phase_b_not", "phase_b")


def main() -> int:
    from fftlab.bench.timing import chain_time, min_slope, stall_watchdog

    interpret = jax.default_backend() != "tpu"
    if not interpret:
        stall_watchdog(ART, stall_s=2400.0)
    B, n = 16, 1 << 20
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    fns = {}
    for v in VARIANTS:
        t0 = time.time()
        try:
            fn = _mk_variant(v, B, n, interpret)
            fn(xr, xi)[0].block_until_ready()
            fns[v] = fn
            log(name=f"warm_{v}", compile_s=round(time.time() - t0, 1))
        except Exception as ex:  # noqa: BLE001
            log(name=f"warm_{v}", error=str(ex)[:300],
                compile_s=round(time.time() - t0, 1))

    if interpret:
        log(name="done", mode="interpret-smoke", variants=sorted(fns))
        return 0

    # Also time the real kernel in the same window for attribution.
    from fftlab.kernels.resident_vmem import fft_split_resident

    fns["full_v2"] = lambda a, b: fft_split_resident(a, b, FORWARD)
    fns["full_v2"](xr, xi)[0].block_until_ready()

    # Control-window counting (the A/B-validated pattern): a round is
    # COUNTED only when the full v2 kernel's time lands near its best
    # known healthy value (3.9 ms, r3s1 diag) — attribution deltas from
    # a congested round are noise (observed: negative slopes, 5x
    # round-to-round swings with no code change).
    want = int(os.environ.get("DIAG_ROUNDS", "2"))
    deadline = time.time() + float(os.environ.get("DIAG_WAIT_S", "3600"))
    counted = 0
    while counted < want and time.time() < deadline:
        row = {"name": "diag_round", "round": counted}
        for v, fn in fns.items():
            try:
                raw = chain_time(
                    fn,
                    lambda i: (xr + jnp.float32(1e-3 * i),
                               xi - jnp.float32(1e-3 * i)),
                    ks=(3, 8, 14), repeats=3, return_raw=True)
                dt = min_slope(raw)
                row[v + "_ms"] = round(dt * 1e3, 4)
            except Exception as ex:  # noqa: BLE001
                row[v + "_err"] = str(ex)[:160]
        ctrl = row.get("full_v2_ms", -1.0)
        row["counted"] = bool(3.0 <= ctrl <= 12.0)
        log(**row)
        if row["counted"]:
            counted += 1
        else:
            time.sleep(45)
    log(name="done", counted=counted)
    return 0 if counted else 3


if __name__ == "__main__":
    sys.exit(main())
