"""Tests for the split re/im TPU fast path (algos/split_stockham.py):
must match the complex-dtype path and the numpy oracle exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.algos.split_stockham import (
    fft_split,
    ifft_split,
    irfft_split,
    rfft_split,
    spectral_filter_split,
    to_split,
    from_split,
)
from fftlab.core.types import Direction


def _rand(rng, shape):
    return rng.standard_normal(shape), rng.standard_normal(shape)


SIZES = [1, 2, 4, 8, 64, 128, 1024, 4096, 12, 360, 1000]


class TestFftSplit:
    @pytest.mark.parametrize("n", SIZES)
    def test_forward_matches_numpy(self, n):
        rng = np.random.default_rng(n)
        xr, xi = _rand(rng, (3, n))
        yr, yi = fft_split(xr, xi)
        got = from_split(yr, yi)
        want = np.fft.fft(xr + 1j * xi)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-9 * max(n, 8))

    @pytest.mark.parametrize("n", [8, 1024, 360])
    def test_roundtrip(self, n):
        rng = np.random.default_rng(n + 1)
        xr, xi = _rand(rng, (n,))
        Yr, Yi = fft_split(xr, xi)
        br, bi = ifft_split(Yr, Yi)
        np.testing.assert_allclose(np.asarray(br), xr, atol=1e-10)
        np.testing.assert_allclose(np.asarray(bi), xi, atol=1e-10)

    def test_float32(self):
        rng = np.random.default_rng(7)
        n = 16384
        xr = rng.standard_normal((2, n)).astype(np.float32)
        xi = rng.standard_normal((2, n)).astype(np.float32)
        got = from_split(*fft_split(xr, xi))
        want = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        snr = 10 * np.log10(
            np.sum(np.abs(want) ** 2) / np.sum(np.abs(got - want) ** 2)
        )
        assert snr > 100.0, f"float32 SNR {snr:.1f} dB"

    def test_to_from_split(self):
        rng = np.random.default_rng(8)
        x = rng.standard_normal(64) + 1j * rng.standard_normal(64)
        xr, xi = to_split(x)
        np.testing.assert_allclose(from_split(xr, xi), x)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            fft_split(jnp.zeros(8), jnp.zeros(4))


class TestRfftSplit:
    @pytest.mark.parametrize("n", [4, 16, 256, 1024, 9, 15])
    def test_matches_numpy_rfft(self, n):
        rng = np.random.default_rng(n + 2)
        x = rng.standard_normal((2, n))
        Xr, Xi = rfft_split(x)
        got = from_split(Xr, Xi)
        np.testing.assert_allclose(got, np.fft.rfft(x), atol=1e-10)

    @pytest.mark.parametrize("n", [4, 16, 256, 10])
    def test_irfft_roundtrip(self, n):
        rng = np.random.default_rng(n + 3)
        x = rng.standard_normal((2, n))
        Xr, Xi = rfft_split(x)
        back = irfft_split(Xr, Xi, n=n)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-10)


class TestSpectralFilterSplit:
    def test_matches_complex_sandwich(self):
        rng = np.random.default_rng(9)
        n = 1024
        xr, xi = _rand(rng, (2, n))
        H = np.fft.fft(rng.standard_normal(n))
        yr, yi = spectral_filter_split(
            xr, xi, jnp.asarray(H.real), jnp.asarray(H.imag)
        )
        got = from_split(yr, yi)
        want = np.fft.ifft(np.fft.fft(xr + 1j * xi) * H)
        np.testing.assert_allclose(got, want, atol=1e-9)
