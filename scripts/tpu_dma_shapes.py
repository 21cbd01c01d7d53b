"""Isolate WHY manual make_async_copy runs at ~0.7 GB/s in the resident
kernel: time HBM->VMEM->HBM passthrough kernels over (a) manual DMA of
the full 4 MB matrix, (b) manual DMA in row slabs, (c) BlockSpec
pipelined blocks (the framework's own path), (d) manual DMA with small
scratch only. Appends to bench_artifacts/dma_shapes.jsonl.
"""
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

ART = "bench_artifacts/dma_shapes.jsonl"
L1 = L2 = 1024
B = 16
NBYTES = 2 * 2 * 4 * B * L1 * L2  # rd+wr, 2 planes


def log(**kw):
    kw["t"] = round(time.time(), 1)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def manual_full():
    def kernel(xr, xi, outr, outi, Mr, Mi, sems):
        b = pl.program_id(0)
        d1 = pltpu.make_async_copy(xr.at[b], Mr, sems.at[0])
        d2 = pltpu.make_async_copy(xi.at[b], Mi, sems.at[1])
        d1.start(); d2.start(); d1.wait(); d2.wait()
        d3 = pltpu.make_async_copy(Mr, outr.at[b], sems.at[2])
        d4 = pltpu.make_async_copy(Mi, outi.at[b], sems.at[3])
        d3.start(); d4.start(); d3.wait(); d4.wait()

    return kernel, [
        pltpu.VMEM((L1, L2), jnp.float32),
        pltpu.VMEM((L1, L2), jnp.float32),
        pltpu.SemaphoreType.DMA((4,)),
    ]


def manual_slabs(rows=128):
    S = L1 // rows

    def kernel(xr, xi, outr, outi, Mr, Mi, sems):
        b = pl.program_id(0)
        pend = []
        for s in range(S):
            sl = pl.ds(s * rows, rows)
            d1 = pltpu.make_async_copy(xr.at[b, sl, :], Mr.at[sl, :],
                                       sems.at[s % 8])
            d2 = pltpu.make_async_copy(xi.at[b, sl, :], Mi.at[sl, :],
                                       sems.at[8 + s % 8])
            d1.start(); d2.start()
            pend.append((d1, d2))
            if len(pend) > 4:
                a1, a2 = pend.pop(0)
                a1.wait(); a2.wait()
        for a1, a2 in pend:
            a1.wait(); a2.wait()
        pend = []
        for s in range(S):
            sl = pl.ds(s * rows, rows)
            d3 = pltpu.make_async_copy(Mr.at[sl, :], outr.at[b, sl, :],
                                       sems.at[16 + s % 8])
            d4 = pltpu.make_async_copy(Mi.at[sl, :], outi.at[b, sl, :],
                                       sems.at[24 + s % 8])
            d3.start(); d4.start()
            pend.append((d3, d4))
            if len(pend) > 4:
                a1, a2 = pend.pop(0)
                a1.wait(); a2.wait()
        for a1, a2 in pend:
            a1.wait(); a2.wait()

    return kernel, [
        pltpu.VMEM((L1, L2), jnp.float32),
        pltpu.VMEM((L1, L2), jnp.float32),
        pltpu.SemaphoreType.DMA((32,)),
    ]


def run_manual(name, factory):
    kernel, scratch = factory() if callable(factory) else factory
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    @jax.jit
    def run(ar, ai):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[hbm, hbm],
            out_specs=(hbm, hbm),
            out_shape=(jax.ShapeDtypeStruct((B, L1, L2), jnp.float32),) * 2,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                has_side_effects=True,
            ),
        )(ar, ai)

    time_one(name, run)


def blockspec_pass():
    def kernel(xr, xi, outr, outi):
        outr[...] = xr[...]
        outi[...] = xi[...]

    blk = pl.BlockSpec((1, 128, L2), lambda s, b: (b, s, 0),
                       memory_space=pltpu.VMEM)

    @jax.jit
    def run(ar, ai):
        return pl.pallas_call(
            kernel,
            grid=(L1 // 128, B),
            in_specs=[blk, blk],
            out_specs=(blk, blk),
            out_shape=(jax.ShapeDtypeStruct((B, L1, L2), jnp.float32),) * 2,
        )(ar, ai)

    time_one("blockspec_pass", run)


def time_one(name, run):
    from fftlab.bench.timing import chain_time, min_slope

    rng = np.random.default_rng(0)
    ar = jnp.asarray(rng.standard_normal((B, L1, L2)), jnp.float32)
    ai = jnp.asarray(rng.standard_normal((B, L1, L2)), jnp.float32)
    try:
        t0 = time.time()
        run(ar, ai)[0].block_until_ready()
        compile_s = round(time.time() - t0, 1)

        def step(a, b):
            c, d = run(a, b)
            return c, d

        raw = chain_time(step, lambda i: (ar + jnp.float32(i),
                                          ai - jnp.float32(i)),
                         ks=(3, 8, 16), repeats=3, return_raw=True)
        dt = min_slope(raw)
        log(name=name, ms=round(dt * 1e3, 3),
            gbps=round(NBYTES / dt / 1e9, 1), compile_s=compile_s)
    except Exception as ex:  # noqa: BLE001
        log(name=name, error=str(ex)[:300])


def main():
    assert jax.devices()[0].platform == "tpu"
    blockspec_pass()
    run_manual("manual_full", manual_full)
    run_manual("manual_slabs128", lambda: manual_slabs(128))
    run_manual("manual_slabs256", lambda: manual_slabs(256))
    return 0


if __name__ == "__main__":
    sys.exit(main())
