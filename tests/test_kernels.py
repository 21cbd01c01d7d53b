"""Pallas kernel tests (interpret mode — the sanitizer analog from
SURVEY.md §5: `interpret=True` is the race-free debugging path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.core.types import Direction
from fftlab.kernels.fft_vmem import (
    pallas_fft,
    pallas_fft_split,
    pallas_spectral_filter,
    supported_size,
)


def _snr(got, want):
    return 10 * np.log10(
        np.sum(np.abs(want) ** 2) / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )


class TestPallasFft:
    def test_supported_size(self):
        assert supported_size(1024) and supported_size(16384)
        assert not supported_size(512)      # m=4 < 8
        assert not supported_size(100)      # not multiple of 128
        assert not supported_size(1536)     # m=12 not pow2
        assert not supported_size(32768)    # m=256 > 128

    @pytest.mark.parametrize("n", [1024, 2048, 8192, 16384])
    def test_forward_matches_numpy(self, n):
        rng = np.random.default_rng(n)
        xr = rng.standard_normal((2, n)).astype(np.float32)
        xi = rng.standard_normal((2, n)).astype(np.float32)
        yr, yi = pallas_fft_split(xr, xi, interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        assert _snr(got, want) > 110.0

    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        n = 4096
        xr = rng.standard_normal((n,)).astype(np.float32)
        xi = rng.standard_normal((n,)).astype(np.float32)
        yr, yi = pallas_fft_split(xr, xi, interpret=True)
        br, bi = pallas_fft_split(yr, yi, Direction.INVERSE, interpret=True)
        np.testing.assert_allclose(np.asarray(br), xr, atol=1e-4)
        np.testing.assert_allclose(np.asarray(bi), xi, atol=1e-4)

    def test_complex_wrapper(self):
        rng = np.random.default_rng(2)
        x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024))
        got = np.asarray(pallas_fft(x, interpret=True))
        assert _snr(got, np.fft.fft(x)) > 110.0

    def test_multi_batch_dims(self):
        rng = np.random.default_rng(3)
        xr = rng.standard_normal((2, 3, 1024)).astype(np.float32)
        xi = np.zeros_like(xr)
        yr, yi = pallas_fft_split(xr, xi, interpret=True)
        assert yr.shape == (2, 3, 1024)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert _snr(got, np.fft.fft(xr.astype(np.float64))) > 110.0

    def test_unsupported_size_raises(self):
        with pytest.raises(ValueError):
            pallas_fft_split(jnp.zeros(100), jnp.zeros(100))

    def test_matches_xla_split_path(self):
        from fftlab.algos.split_stockham import fft_split

        rng = np.random.default_rng(4)
        xr = rng.standard_normal((2, 2048)).astype(np.float32)
        xi = rng.standard_normal((2, 2048)).astype(np.float32)
        pr, pi = pallas_fft_split(xr, xi, interpret=True)
        sr, si = fft_split(xr, xi)
        np.testing.assert_allclose(np.asarray(pr), np.asarray(sr),
                                   rtol=1e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(pi), np.asarray(si),
                                   rtol=1e-3, atol=2e-2)


class TestPallasSpectralFilter:
    @pytest.mark.parametrize("n", [1024, 4096])
    def test_matches_unfused_sandwich(self, n):
        rng = np.random.default_rng(n)
        xr = rng.standard_normal((2, n)).astype(np.float32)
        xi = rng.standard_normal((2, n)).astype(np.float32)
        H = np.fft.fft(rng.standard_normal(n))
        fr, fi = pallas_spectral_filter(
            xr, xi, H.real.astype(np.float32), H.imag.astype(np.float32),
            interpret=True,
        )
        got = np.asarray(fr) + 1j * np.asarray(fi)
        want = np.fft.ifft(
            np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64)) * H
        )
        assert _snr(got, want) > 105.0

    def test_identity_response(self):
        rng = np.random.default_rng(9)
        n = 1024
        xr = rng.standard_normal((n,)).astype(np.float32)
        xi = rng.standard_normal((n,)).astype(np.float32)
        fr, fi = pallas_spectral_filter(
            xr, xi, np.ones(n, np.float32), np.zeros(n, np.float32),
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(fr), xr, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fi), xi, atol=1e-4)



class TestPallasOsFilter:
    @pytest.mark.parametrize("n,nh,fft", [(40000, 129, 2048),
                                          (5000, 7, 2048)])
    def test_matches_convolution(self, n, nh, fft):
        from fftlab.kernels.os_filter_vmem import pallas_os_filter_split

        rng = np.random.default_rng(n + nh)
        x0 = rng.standard_normal(n).astype(np.float32)
        x1 = rng.standard_normal(n).astype(np.float32)
        h = rng.standard_normal(nh)
        yr, yi = pallas_os_filter_split(x0, x1, h, fft_size=fft,
                                        interpret=True)
        w0 = np.convolve(x0.astype(np.float64), h)[:n]
        w1 = np.convolve(x1.astype(np.float64), h)[:n]
        scale = max(np.abs(w0).max(), 1.0)
        assert np.abs(np.asarray(yr) - w0).max() / scale < 1e-5
        assert np.abs(np.asarray(yi) - w1).max() / scale < 1e-5

    def test_batched_matches_per_channel(self):
        """[C, n] input fans the grid out over channels; each channel
        equals its own 1D run."""
        from fftlab.kernels.os_filter_vmem import pallas_os_filter_split

        rng = np.random.default_rng(42)
        C, n, nh = 3, 4000, 33
        xr = rng.standard_normal((C, n)).astype(np.float32)
        xi = rng.standard_normal((C, n)).astype(np.float32)
        h = rng.standard_normal(nh)
        yr, yi = pallas_os_filter_split(xr, xi, h, fft_size=2048,
                                        interpret=True)
        assert yr.shape == (C, n)
        for c in range(C):
            sr, si = pallas_os_filter_split(xr[c], xi[c], h,
                                            fft_size=2048, interpret=True)
            np.testing.assert_array_equal(np.asarray(yr[c]), np.asarray(sr))
            np.testing.assert_array_equal(np.asarray(yi[c]), np.asarray(si))

    def test_validation(self):
        from fftlab.kernels.os_filter_vmem import pallas_os_filter_split

        with pytest.raises(ValueError):
            pallas_os_filter_split(np.zeros((2, 8)), np.zeros(8),
                                   np.ones(3), interpret=True)
        with pytest.raises(ValueError):
            pallas_os_filter_split(np.zeros(100, np.float32),
                                   np.zeros(100, np.float32),
                                   np.ones(3), fft_size=1000,
                                   interpret=True)
        with pytest.raises(ValueError):
            pallas_os_filter_split(np.zeros(5000, np.float32),
                                   np.zeros(5000, np.float32),
                                   np.ones(2000), fft_size=1024,
                                   interpret=True)


class TestOsFilterAligned:
    """The pipelined BlockSpec-framed overlap-save variant."""

    def test_aligned_equals_legacy_kernel(self, monkeypatch):
        from fftlab.kernels import os_filter_vmem as m

        rng = np.random.default_rng(5)
        n, nh = 30000, 65
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        h = rng.standard_normal(nh)
        ya = m.pallas_os_filter_split(xr, xi, h, fft_size=2048,
                                      interpret=True)
        monkeypatch.setenv("FFTLAB_OS_ALIGNED", "0")
        yl = m.pallas_os_filter_split(xr, xi, h, fft_size=2048,
                                      interpret=True)
        # same math, different frame size => equal to f32 rounding
        assert np.abs(np.asarray(ya[0]) - np.asarray(yl[0])).max() < 1e-4
        assert np.abs(np.asarray(ya[1]) - np.asarray(yl[1])).max() < 1e-4

    def test_long_taps_fall_back_to_legacy(self):
        from fftlab.kernels.os_filter_vmem import (
            _aligned_layout,
            pallas_os_filter_split,
        )

        # need = 12 rows -> halo rounds to 16 = m: aligned impossible,
        # legacy manual-DMA path (halo_rows=12) must still serve it.
        assert _aligned_layout(1537, 2048) is None
        rng = np.random.default_rng(6)
        n, nh = 9000, 1537
        x = rng.standard_normal(n).astype(np.float32)
        h = rng.standard_normal(nh) / nh
        yr, _ = pallas_os_filter_split(x, np.zeros_like(x), h,
                                       fft_size=2048, interpret=True)
        want = np.convolve(x.astype(np.float64), h)[:n]
        assert np.abs(np.asarray(yr) - want).max() < 1e-5

    def test_frame_count_not_multiple_of_r(self):
        # n chosen so n_blocks % frames_per_program != 0: the padded
        # tail super-block must not corrupt the valid samples.
        from fftlab.kernels.os_filter_vmem import pallas_os_filter_split

        rng = np.random.default_rng(7)
        n, nh = 3 * 1024 + 17, 129
        x = rng.standard_normal(n).astype(np.float32)
        h = rng.standard_normal(nh) / nh
        yr, _ = pallas_os_filter_split(x, np.zeros_like(x), h,
                                       fft_size=2048, interpret=True)
        want = np.convolve(x.astype(np.float64), h)[:n]
        assert np.abs(np.asarray(yr) - want).max() < 1e-5


class TestRfftVmem:
    """MXU permutation-matmul r2c prologue/epilogue (kernels/rfft_vmem):
    the XLA deinterleave/unpack are lane-gather class on TPU."""

    @pytest.mark.parametrize("n", [2048, 8192, 65536])
    def test_pack_interleave_exact(self, n):
        from fftlab.kernels.rfft_vmem import (
            pallas_interleave,
            pallas_pack_real,
        )

        rng = np.random.default_rng(n)
        x = rng.standard_normal((3, n)).astype(np.float32)
        zr, zi = pallas_pack_real(x, interpret=True)
        # 0/1 selection matmuls are EXACT: bitwise deinterleave
        np.testing.assert_array_equal(np.asarray(zr), x[..., 0::2])
        np.testing.assert_array_equal(np.asarray(zi), x[..., 1::2])
        back = pallas_interleave(zr, zi, interpret=True)
        np.testing.assert_array_equal(np.asarray(back), x)

    @pytest.mark.parametrize("n", [2048, 65536])
    def test_hermitian_unpack_matches_numpy(self, n):
        from fftlab.kernels.rfft_vmem import pallas_hermitian_unpack

        rng = np.random.default_rng(n + 1)
        x = rng.standard_normal((2, n)).astype(np.float32)
        z = (x[..., 0::2].astype(np.float64)
             + 1j * x[..., 1::2].astype(np.float64))
        Z = np.fft.fft(z, axis=-1)
        Xr, Xi = pallas_hermitian_unpack(
            jnp.asarray(Z.real, jnp.float32),
            jnp.asarray(Z.imag, jnp.float32), n, interpret=True)
        got = np.asarray(Xr, np.float64) + 1j * np.asarray(Xi, np.float64)
        want = np.fft.rfft(x.astype(np.float64), axis=-1)
        assert got.shape == want.shape
        assert _snr(got, want) > 120.0
        # seam bins: DC and Nyquist exactly real
        np.testing.assert_allclose(np.asarray(Xi)[..., 0], 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Xi)[..., -1], 0.0, atol=1e-7)

    def test_unsupported_sizes_raise(self):
        from fftlab.kernels.rfft_vmem import (
            pallas_hermitian_unpack,
            pallas_pack_real,
        )

        with pytest.raises(ValueError):
            pallas_pack_real(np.zeros((1, 100), np.float32), interpret=True)
        with pytest.raises(ValueError):
            pallas_hermitian_unpack(np.zeros((1, 512), np.float32),
                                    np.zeros((1, 512), np.float32),
                                    1024, interpret=True)
