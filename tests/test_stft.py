"""STFT / ISTFT / spectrogram tests (dsp/stft.py — the batched
re-design of realtime_analyzer.c's hop loop)."""

import numpy as np
import pytest

from fftlab.core.window import hann
from fftlab.dsp.stft import (
    frame_signal,
    istft,
    spectrogram,
    stft,
    stft_complex,
)


class TestFraming:
    def test_frame_signal_pad(self):
        x = np.arange(10, dtype=np.float32)
        f = np.asarray(frame_signal(x, 4, 2, pad=True))
        assert f.shape[-1] == 4
        np.testing.assert_array_equal(f[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(f[1], [2, 3, 4, 5])

    def test_frame_signal_valid(self):
        x = np.arange(10, dtype=np.float32)
        f = np.asarray(frame_signal(x, 4, 3, pad=False))
        assert f.shape == (3, 4)
        np.testing.assert_array_equal(f[2], [6, 7, 8, 9])


class TestStftIstft:
    def test_stft_matches_numpy(self):
        rng = np.random.default_rng(0)
        n, fft_size, hop = 4096, 512, 256
        x = rng.standard_normal(n)
        S = np.asarray(stft(x, fft_size, hop))
        w = hann(fft_size)
        want0 = np.fft.rfft(x[:fft_size] * w)
        np.testing.assert_allclose(S[0], want0, atol=1e-8)

    def test_cola_roundtrip(self):
        """Hann at 50/75% overlap satisfies COLA: istft(stft(x)) == x."""
        rng = np.random.default_rng(1)
        n = 8192
        x = rng.standard_normal(n)
        for hop in (256, 128):
            S = stft(x, 512, hop)
            y = np.asarray(istft(S, 512, hop, length=n))
            # Edges lose window support; compare the interior.
            np.testing.assert_allclose(y[512:-512], x[512:-512], atol=1e-6,
                                       err_msg=f"hop={hop}")

    def test_istft_split_cola_roundtrip(self):
        """The split-plane inverse reconstructs through the split-plane
        forward — complex-free round trip, both OLA code paths."""
        from fftlab.dsp.stft import istft_split, stft_split

        rng = np.random.default_rng(7)
        n = 8192
        x = rng.standard_normal(n).astype(np.float32)
        for hop in (256, 128):  # k = 2 and 4 (vectorized OLA)
            Sr, Si = stft_split(x, 512, hop)
            y = np.asarray(istft_split(Sr, Si, 512, hop, length=n))
            np.testing.assert_allclose(y[512:-512], x[512:-512], atol=1e-4,
                                       err_msg=f"hop={hop}")

    def test_stft_split_ceil_framing_matches_stft(self):
        """stft_split's frame count equals stft's pad=True ceil framing
        (regression: floor framing silently dropped the tail)."""
        from fftlab.dsp.stft import stft_split

        fft_size, hop = 2048, 512
        n = fft_size + hop + 1  # one extra partial hop
        x = np.random.default_rng(9).standard_normal(n).astype(np.float32)
        S = np.asarray(stft(x, fft_size, hop))
        Sr, Si = stft_split(x, fft_size, hop)
        assert Sr.shape[0] == S.shape[0] == 3
        got = np.asarray(Sr, np.float64) + 1j * np.asarray(Si, np.float64)
        np.testing.assert_allclose(got, S, atol=1e-3)

    def test_istft_split_rejects_odd_fft_size(self):
        from fftlab.dsp.stft import istft_split

        with pytest.raises(ValueError, match="even fft_size"):
            istft_split(np.zeros((4, 3), np.float32),
                        np.zeros((4, 3), np.float32), fft_size=5, hop=2)

    def test_istft_split_matches_istft(self):
        from fftlab.dsp.stft import istft_split

        rng = np.random.default_rng(8)
        n = 4096
        x = rng.standard_normal(n)
        S = stft(x, 512, 128)
        want = np.asarray(istft(S, 512, 128, length=n))
        got = np.asarray(istft_split(np.real(np.asarray(S)),
                                     np.imag(np.asarray(S)),
                                     512, 128, length=n))
        # Edges divide by a tiny COLA norm, amplifying the f32-vs-f64
        # difference between the two paths; compare the interior.
        np.testing.assert_allclose(got[512:-512], want[512:-512], atol=1e-4)

    def test_istft_split_validation(self):
        from fftlab.dsp.stft import istft_split

        with pytest.raises(ValueError):
            istft_split(np.zeros((3, 100)), np.zeros((3, 100)), 512, 128)
        with pytest.raises(ValueError):
            istft_split(np.zeros(257), np.zeros(257), 512, 128)

    def test_stft_complex_full_bins(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
        S = np.asarray(stft_complex(x, 256, 128))
        assert S.shape[-1] == 256  # two-sided

    def test_spectrogram_averaging_smooths(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(16384)
        raw = np.asarray(spectrogram(x, 512, 256, averaging=1))
        avg = np.asarray(spectrogram(x, 512, 256, averaging=4))
        assert raw.shape == avg.shape
        # EMA reduces frame-to-frame variance.
        assert np.var(np.diff(avg, axis=0)) < np.var(np.diff(raw, axis=0))

    def test_batched_stft(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((3, 4096))
        S = np.asarray(stft(x, 512, 256))
        for i in range(3):
            np.testing.assert_allclose(
                S[i], np.asarray(stft(x[i], 512, 256)), atol=1e-9)
