"""Environment compatibility helpers.

Some TPU runtimes (including this environment's tunneled backend) reject
complex dtypes outright — the split re/im fast path is unaffected, but
the complex-dtype convenience API (and every demo built on it) must run
on CPU there. `prefer_cpu_for_complex()` routes demos to CPU; set
FFTLAB_ALLOW_TPU_COMPLEX=1 on TPU stacks with complex support to keep
the accelerator.
"""

from __future__ import annotations

import os


def prefer_cpu_for_complex() -> None:
    """Call BEFORE first device use in complex-dtype entry points.

    Unconditional (modulo the env override): merely *querying* the
    default backend would initialize it, after which the platform can no
    longer be switched — so don't probe, just pick CPU for demo-scale
    complex work.
    """
    if os.environ.get("FFTLAB_ALLOW_TPU_COMPLEX"):
        return
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
