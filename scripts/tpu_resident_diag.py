"""Decompose the resident kernel's 105 ms pathology: time stripped
variants that isolate the in-DMA, the phase-A compute, the phase-B
compute, and the strided out-DMA. Each variant is a small standalone
pallas_call built here (results are wrong on purpose — only the time
matters). Appends to bench_artifacts/resident_diag.jsonl.
"""
import functools
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

from fftlab.kernels.fourstep_vmem import (  # noqa: E402
    _col_fft_tables,
    _col_fft_vmem,
    _rank1_twiddle_np,
    _split_factors,
    _split_sides,
)
from fftlab.core.types import Direction  # noqa: E402

ART = "bench_artifacts/resident_diag.jsonl"
L1 = L2 = 1024
N = L1 * L2
B = 16
W = R = 128


def log(**kw):
    kw["t"] = round(time.time(), 1)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def make_variant(mode: str):
    """mode in dma_only | dma_in_only | phaseA | phaseB | full"""
    fa, fb = _split_factors(L1)
    tabs_np = _col_fft_tables(L1, Direction.FORWARD)
    A, P = _rank1_twiddle_np(L1, L2, W, Direction.FORWARD)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    Pr = jnp.asarray(P.real.astype(np.float32))
    Pi = jnp.asarray(P.imag.astype(np.float32))

    def kernel(xr_hbm, xi_hbm, F1, F2, F3, F4, F5, F6,
               Ar_, Ai_, Pr_, Pi_, or_hbm, oi_hbm,
               Mr, Mi, s0r, s0i, in_sems, out_sems):
        b = pl.program_id(0)
        dr = pltpu.make_async_copy(xr_hbm.at[b], Mr, in_sems.at[0])
        di = pltpu.make_async_copy(xi_hbm.at[b], Mi, in_sems.at[1])
        dr.start()
        di.start()
        dr.wait()
        di.wait()
        tabs = (F1[...], F2[...], F3[...], F4[...], F5[...], F6[...])
        pr = Pr_[...]
        pi = Pi_[...]
        if mode in ("phaseA", "full"):
            for c in range(L2 // W):
                sl = slice(c * W, (c + 1) * W)
                yr, yi = _col_fft_vmem(Mr[:, sl], Mi[:, sl], tabs, fa, fb)
                ar = Ar_[c]
                ai = Ai_[c]
                wr = ar * pr - ai * pi
                wi = ar * pi + ai * pr
                Mr[:, sl] = yr * wr - yi * wi
                Mi[:, sl] = yr * wi + yi * wr
        if mode in ("phaseB", "full"):
            # phase-B compute, but CONTIGUOUS row-aligned out DMA
            # (no transpose of destination): isolates compute+transpose
            # from write stride
            pend = None
            for g in range(L1 // R):
                if pend is not None:
                    pend[0].wait()
                    pend[1].wait()
                rs = slice(g * R, (g + 1) * R)
                tr = jnp.transpose(Mr[rs, :], (1, 0))
                ti = jnp.transpose(Mi[rs, :], (1, 0))
                yr, yi = _col_fft_vmem(tr, ti, tabs, fa, fb)
                s0r[...] = yr
                s0i[...] = yi
                d1 = pltpu.make_async_copy(
                    s0r, or_hbm.at[b, :, pl.ds(g * R, R)], out_sems.at[0])
                d2 = pltpu.make_async_copy(
                    s0i, oi_hbm.at[b, :, pl.ds(g * R, R)], out_sems.at[1])
                d1.start()
                d2.start()
                pend = (d1, d2)
            pend[0].wait()
            pend[1].wait()
        else:
            # plain contiguous full-matrix writeback
            d1 = pltpu.make_async_copy(Mr, or_hbm.at[b], out_sems.at[0])
            d2 = pltpu.make_async_copy(Mi, oi_hbm.at[b], out_sems.at[1])
            d1.start()
            d2.start()
            d1.wait()
            d2.wait()

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def run(xr, xi):
        x3r = xr.reshape(B, L1, L2)
        x3i = xi.reshape(B, L1, L2)
        yr, yi = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[hbm, hbm] + [const] * 10,
            out_specs=(hbm, hbm),
            out_shape=(jax.ShapeDtypeStruct((B, L2, L1), jnp.float32),) * 2,
            scratch_shapes=[
                pltpu.VMEM((L1, L2), jnp.float32),
                pltpu.VMEM((L1, L2), jnp.float32),
                pltpu.VMEM((L2, R), jnp.float32),
                pltpu.VMEM((L2, R), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=False,
        )(x3r, x3i, *tabs_np, Ar, Ai, Pr, Pi)
        return yr.reshape(B, N), yi.reshape(B, N)

    return run


def main():
    assert jax.devices()[0].platform == "tpu"
    from fftlab.bench.timing import chain_time, min_slope

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)

    for mode in ("dma_only", "phaseA", "phaseB", "full"):
        try:
            run = make_variant(mode)
            t0 = time.time()
            run(xr, xi)[0].block_until_ready()
            compile_s = round(time.time() - t0, 1)

            def step(a, b, run=run):
                c, d = run(a, b)
                s = jnp.float32(1e-20)  # keep magnitudes bounded
                return c * s + a, d * s + b

            raw = chain_time(step,
                             lambda i: (xr + jnp.float32(1e-3 * i),
                                        xi - jnp.float32(1e-3 * i)),
                             ks=(2, 5, 8), repeats=3, return_raw=True)
            dt = min_slope(raw)
            log(mode=mode, ms=round(dt * 1e3, 3), compile_s=compile_s)
        except Exception as ex:  # noqa: BLE001
            log(mode=mode, error=str(ex)[:300])
    return 0


if __name__ == "__main__":
    sys.exit(main())
