"""Benchmark harness: warm-up + sync timing, accuracy gates, roofline
accounting (reference benchmarks/benchmark_all.c analog)."""

from fftlab.bench.harness import (
    BenchResult,
    benchmark_algorithm,
    benchmark_suite,
    complexity_exponent,
    print_table,
    roofline,
    time_fn,
)
