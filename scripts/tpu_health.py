"""Quick TPU health check: chained XLA copy bandwidth + sync RTT.

The tunneled device's effective bandwidth swings wildly with service
load (healthy ~285 GB/s; degraded <10 GB/s observed). Run this before
trusting any benchmark number.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from fftlab.bench.timing import chain_time, min_slope

def main():
    d = jax.devices()[0]
    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones((8, 128)) + 1)[:1]
    rtt = time.perf_counter() - t0
    shape = (16, 1 << 20)
    x = jnp.ones(shape, jnp.float32)
    y = jnp.ones(shape, jnp.float32)
    mk = lambda i: (x + jnp.float32(i), y - jnp.float32(i))
    dt = min_slope(chain_time(lambda a, b: (a + 1.0, b + 1.0), mk,
                              ks=(4, 64), repeats=3, return_raw=True))
    gbps = 2 * 2 * 4 * shape[0] * shape[1] / dt / 1e9
    print(f"platform={d.platform} first-sync={rtt*1e3:.0f}ms "
          f"copy={dt*1e3:.3f}ms eff_bw={gbps:.0f} GB/s "
          f"{'HEALTHY' if gbps > 200 else 'DEGRADED'}", flush=True)

if __name__ == "__main__":
    main()
