"""Wait for the TPU service to come back, then exit 0.

The tunnel has outage windows where even a trivial device op never
returns. Each attempt runs in a FRESH subprocess with a hard timeout
(a wedged client process never recovers — the runtime blocks forever
on the dead RPC), so the parent survives any number of dead windows.
Logs attempts to bench_artifacts/waitup.log.
"""
import os
import subprocess
import sys
import time

PING = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((8, 1024), jnp.float32); "
    "(x + 1.0).block_until_ready(); "
    "print('up', jax.devices()[0].platform)"
)


def main():
    deadline = time.time() + float(os.environ.get("WAITUP_S", "14400"))
    os.makedirs("bench_artifacts", exist_ok=True)
    log = open("bench_artifacts/waitup.log", "a")
    while time.time() < deadline:
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", PING], timeout=180,
                               capture_output=True, text=True)
            ok = r.returncode == 0 and "up tpu" in r.stdout
        except subprocess.TimeoutExpired:
            ok = False
        msg = f"{time.strftime('%H:%M:%S')} ping " \
              f"{'OK' if ok else 'dead'} ({time.time() - t0:.0f}s)"
        print(msg, file=log, flush=True)
        if ok:
            return 0
        time.sleep(120)
    return 1


if __name__ == "__main__":
    sys.exit(main())
