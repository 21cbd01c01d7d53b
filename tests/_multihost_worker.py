"""Worker process for tests/test_multihost.py.

Runs as one of two cooperating processes: initializes jax.distributed
through fftlab.dist.multihost.ensure_initialized (the code under test),
builds a 4-device global mesh (2 processes x 2 local CPU devices), runs
the sharded overlap-save filter, and checks THIS process's addressable
output shards against the numpy oracle. Exit code 0 = pass.

Usage: python tests/_multihost_worker.py <coordinator_addr> <process_id>
(XLA_FLAGS=--xla_force_host_platform_device_count=2 must be in the env.)
"""

from __future__ import annotations

import sys


def main() -> int:
    addr, pid = sys.argv[1], int(sys.argv[2])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from fftlab.dist.multihost import ensure_initialized, process_info

    active = ensure_initialized(
        coordinator_address=addr, num_processes=2, process_id=pid
    )
    assert active, "ensure_initialized returned False for 2 processes"
    info = process_info()
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fftlab.dist.overlap_save_split import (
        overlap_save_filter_sharded_split,
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("sp",))

    n, nh = 4096, 33
    rng = np.random.default_rng(7)
    xr_np = rng.standard_normal(n).astype(np.float32)
    xi_np = rng.standard_normal(n).astype(np.float32)
    h_np = rng.standard_normal(nh).astype(np.float32)

    sh = NamedSharding(mesh, P("sp"))
    rep = NamedSharding(mesh, P())
    xr = jax.make_array_from_callback((n,), sh, lambda i: xr_np[i])
    xi = jax.make_array_from_callback((n,), sh, lambda i: xi_np[i])
    h = jax.make_array_from_callback((nh,), rep, lambda i: h_np[i])

    yr, yi = overlap_save_filter_sharded_split(xr, xi, h, mesh)

    want_r = np.convolve(xr_np.astype(np.float64), h_np)[:n]
    want_i = np.convolve(xi_np.astype(np.float64), h_np)[:n]
    for out, want in ((yr, want_r), (yi, want_i)):
        for shard in out.addressable_shards:
            sl = shard.index[0]
            got = np.asarray(shard.data)
            np.testing.assert_allclose(got, want[sl], atol=5e-3)
    print(f"proc {pid}: sharded output matches oracle on "
          f"{len(yr.addressable_shards)} local shards", flush=True)

    # PP across the process boundary: the 4 pipeline stages span the
    # 2-process x 2-device grid, so two of the three ppermute hand-offs
    # ride intra-process links and one crosses the process edge (the
    # DCN analog).
    from fftlab.dist.pp_pipeline import pp_spectral_pipeline_split

    B, nb = 5, 128
    br_np = rng.standard_normal((B, nb)).astype(np.float32)
    bi_np = rng.standard_normal((B, nb)).astype(np.float32)
    hr_np = rng.standard_normal(nb).astype(np.float32)
    hi_np = rng.standard_normal(nb).astype(np.float32)  # complex H
    br = jax.make_array_from_callback((B, nb), rep, lambda i: br_np[i])
    bi = jax.make_array_from_callback((B, nb), rep, lambda i: bi_np[i])
    pr_, pi_ = pp_spectral_pipeline_split(br, bi, hr_np, hi_np, mesh,
                                          axis_name="sp")
    # Independent numpy oracle (per-block circular spectral filter).
    H = hr_np.astype(np.float64) + 1j * hi_np.astype(np.float64)
    want = np.fft.ifft(np.fft.fft(
        br_np.astype(np.float64) + 1j * bi_np.astype(np.float64),
        axis=-1) * H, axis=-1)
    for out, want_p in ((pr_, want.real), (pi_, want.imag)):
        for shard in out.addressable_shards:  # replicated: every copy
            np.testing.assert_allclose(np.asarray(shard.data),
                                       want_p[shard.index], atol=1e-3)
    print(f"proc {pid}: PP pipeline output matches the numpy oracle "
          f"across the process boundary", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
