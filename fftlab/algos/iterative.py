"""Pedagogical iterative FFT with an execution-plan explainer.

TPU-native analog of reference algorithms/core/iterative_fft.c:57-175 —
the same math as radix-2 DIT, but the module's purpose is teaching: the
`explain()` function prints each stage's butterfly geometry, twiddle span
and the TPU execution story (what the reference's memory-access visualizer
and toy cache simulator, iterative_fft.c:101-175, become when the "cache"
is VMEM and the butterflies are whole-array VPU ops).
"""

from __future__ import annotations

from fftlab.algos.radix2 import radix2_dit
from fftlab.core.bitrev import bit_reverse_indices
from fftlab.core.types import FORWARD, is_power_of_two, log2_int


def iterative_fft(x, direction=FORWARD):
    """Identical numerics to radix2_dit; exists as the annotated/teaching
    entry in the algorithm registry (iterative_fft.c:57)."""
    return radix2_dit(x, direction)


def explain(n: int) -> str:
    """Describe the stage-by-stage execution plan for an n-point transform
    (host-side; analog of iterative_fft.c:101-133's visualizer)."""
    if not is_power_of_two(n):
        raise ValueError("explain() requires a power-of-two size")
    lines = [
        f"iterative radix-2 DIT plan for n={n} (log2(n)={log2_int(n)} stages)",
        f"  step 0: bit-reversal permutation as ONE gather of {n} indices",
        f"          (table: {list(bit_reverse_indices(min(n, 16)))}{'...' if n > 16 else ''})",
    ]
    for s in range(1, log2_int(n) + 1):
        m = 1 << s
        lines.append(
            f"  stage {s}: {n // m} blocks x {m // 2} butterflies, span m={m}; "
            f"one fused VPU pass over [{n // m}, {m}] view, {m // 2} twiddles W_{m}^j"
        )
    lines.append(
        "  on TPU: all stages execute as vectorized whole-array ops; the\n"
        "  'cache' is VMEM and XLA fuses adjacent elementwise stages."
    )
    return "\n".join(lines)


if __name__ == "__main__":  # pragma: no cover - demo entry point
    print(explain(16))
