"""Pallas TPU kernels — the hand-scheduled fast paths.

The XLA einsum path (algos/split_stockham.py) makes one HBM round trip
per radix stage; these kernels hold the whole transform in VMEM for one
residency: load -> MXU four-step -> (optional spectral multiply ->
inverse four-step) -> store. This is the TPU realization of the
reference's hot loop (radix2_dit.c:84-112) and of the fused
FFT -> H -> IFFT sandwich (SURVEY.md §3.4).
"""

from fftlab.kernels.fft_vmem import (
    pallas_fft,
    pallas_fft_split,
    pallas_spectral_filter,
    supported_size,
)
from fftlab.kernels.stft_vmem import pallas_stft_split
from fftlab.kernels.stage_fused import fused_stage, fft_split_pipeline
