"""Utilities: signal generation, metrics, plotting, file IO.

TPU-native analog of reference utils/fft_utils.c and the signal helpers in
include/fft_common.h:148-196.
"""

from fftlab.utils.signals import (
    generate_sine,
    generate_cosine,
    generate_square,
    generate_impulse,
    generate_dc,
    generate_chirp,
    generate_noise,
    generate_multi_tone,
)
from fftlab.utils.metrics import (
    magnitude,
    phase,
    power_spectrum_bins,
    snr_db,
    max_error,
    rms_error,
    find_peak_interpolated,
)
