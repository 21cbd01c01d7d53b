"""Streaming Pallas STFT kernel tests (interpret mode)."""

import numpy as np
import pytest

from fftlab.core.window import hann
from fftlab.kernels.stft_vmem import pallas_stft_split


def _ref_stft(x, fft_size, hop, window):
    n_frames = (len(x) - fft_size) // hop + 1
    return np.stack([
        np.fft.rfft(x[k * hop : k * hop + fft_size].astype(np.float64) * window)
        for k in range(n_frames)
    ])


class TestPallasStft:
    @pytest.mark.parametrize("fft_size,hop", [(2048, 512), (1024, 256),
                                              (2048, 2048)])
    def test_matches_reference(self, fft_size, hop):
        rng = np.random.default_rng(fft_size + hop)
        x = rng.standard_normal(16384).astype(np.float32)
        yr, yi = pallas_stft_split(x, fft_size, hop, interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = _ref_stft(x, fft_size, hop, hann(fft_size))
        assert got.shape == want.shape
        snr = 10 * np.log10(
            np.sum(np.abs(want) ** 2) / np.sum(np.abs(got - want) ** 2)
        )
        assert snr > 110.0, f"SNR {snr:.1f} dB"

    @pytest.mark.parametrize("fft_size,hop", [(256, 128), (512, 128),
                                              (128, 128), (512, 512)])
    def test_small_frames_match_reference(self, fft_size, hop):
        """The Welch-class frame sizes (m in 1/2/4) run the batched
        interleaved-set kernel; output frame order must be natural."""
        rng = np.random.default_rng(fft_size * 3 + hop)
        x = rng.standard_normal(20000).astype(np.float32)
        yr, yi = pallas_stft_split(x, fft_size, hop, interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        xpad = np.pad(x, (0, (-len(x)) % 128))
        want = _ref_stft(xpad, fft_size, hop, hann(fft_size))
        assert got.shape == want.shape
        snr = 10 * np.log10(
            np.sum(np.abs(want) ** 2) / np.sum(np.abs(got - want) ** 2)
        )
        assert snr > 110.0, f"SNR {snr:.1f} dB"

    def test_small_frame_support_matrix(self):
        from fftlab.kernels.stft_vmem import small_frame_supported

        assert small_frame_supported(256, 128)
        assert small_frame_supported(512, 256)
        assert not small_frame_supported(256, 96)   # hop not row-aligned
        assert not small_frame_supported(384, 128)  # m=3 not pow2
        assert not small_frame_supported(1024, 128)  # big-frame range

    def test_twosided(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(4096).astype(np.float32)
        yr, yi = pallas_stft_split(x, 1024, 512, onesided=False,
                                   interpret=True)
        assert yr.shape == ((4096 - 1024) // 512 + 1, 1024)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        full = np.stack([
            np.fft.fft(x[k * 512 : k * 512 + 1024].astype(np.float64)
                       * hann(1024))
            for k in range(got.shape[0])
        ])
        np.testing.assert_allclose(got, full, atol=1e-2)

    def test_rectangular_window(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(4096).astype(np.float32)
        yr, yi = pallas_stft_split(x, 1024, 1024, window="rectangular",
                                   interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = np.stack([np.fft.rfft(x[k * 1024 : (k + 1) * 1024]
                                     .astype(np.float64)) for k in range(4)])
        snr = 10 * np.log10(
            np.sum(np.abs(want) ** 2) / np.sum(np.abs(got - want) ** 2)
        )
        assert snr > 110.0

    def test_tail_padding(self):
        # Signal not a multiple of 128: padded internally.
        x = np.ones(4000, dtype=np.float32)
        yr, yi = pallas_stft_split(x, 1024, 512, interpret=True)
        assert yr.shape[0] == (4096 - 1024) // 512 + 1

    def test_validation(self):
        x = np.zeros(4096, dtype=np.float32)
        with pytest.raises(ValueError):
            pallas_stft_split(x, 1000, 512, interpret=True)  # not m*128
        with pytest.raises(ValueError):
            pallas_stft_split(x, 1024, 100, interpret=True)  # hop % 128
        with pytest.raises(ValueError):
            pallas_stft_split(np.zeros(512, np.float32), 1024, 256,
                              interpret=True)  # too short
        with pytest.raises(ValueError):
            pallas_stft_split(np.zeros((2, 4096), np.float32), 1024, 256,
                              interpret=True)  # 2D
