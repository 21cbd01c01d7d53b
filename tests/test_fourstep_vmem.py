"""Two-pass large-n VMEM kernel (kernels/fourstep_vmem.py), interpret
mode: natural-order output, forward/inverse, batch handling."""

import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.core.types import Direction
from fftlab.kernels.fourstep_vmem import (
    MAX_N,
    MIN_N,
    fft_split_large,
    supported_large,
)


def _snr(got, want):
    return 10 * np.log10(
        np.sum(np.abs(want) ** 2)
        / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )


class TestFourstepVmem:
    @pytest.mark.parametrize("n", [1 << 15, 1 << 16, 1 << 18, 1 << 19])
    def test_matches_numpy(self, n):
        rng = np.random.default_rng(n % 97)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        yr, yi = fft_split_large(xr, xi, interpret=True)
        for b in range(2):
            got = (np.asarray(yr[b], np.float64)
                   + 1j * np.asarray(yi[b], np.float64))
            want = np.fft.fft(np.asarray(xr[b], np.float64)
                              + 1j * np.asarray(xi[b], np.float64))
            assert _snr(got, want) > 120.0

    @pytest.mark.parametrize("n", [1 << 15, 1 << 18, 1 << 19])
    def test_blocked_mid_matches_numpy(self, n):
        """The blocked-intermediate layout is numerically identical to
        the row-major one (same math, different DMA shapes)."""
        rng = np.random.default_rng(n % 89)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        yr, yi = fft_split_large(xr, xi, interpret=True, blocked=True)
        br, bi = fft_split_large(xr, xi, interpret=True, blocked=False)
        np.testing.assert_array_equal(np.asarray(yr), np.asarray(br))
        np.testing.assert_array_equal(np.asarray(yi), np.asarray(bi))
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0

    def test_blocked_mid_inverse(self):
        n = 1 << 18
        rng = np.random.default_rng(11)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_large(xr, xi, interpret=True, blocked=True)
        br, bi = fft_split_large(yr, yi, Direction.INVERSE,
                                 interpret=True, blocked=True)
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr), atol=1e-3)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi), atol=1e-3)

    def test_inverse_roundtrip(self):
        n = 1 << 18
        rng = np.random.default_rng(5)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_large(xr, xi, interpret=True)
        br, bi = fft_split_large(yr, yi, Direction.INVERSE, interpret=True)
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr), atol=3e-4)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi), atol=3e-4)

    def test_batch_dims_preserved(self):
        n = 1 << 18
        rng = np.random.default_rng(6)
        xr = jnp.asarray(rng.standard_normal((2, 2, n)), jnp.float32)
        xi = jnp.zeros((2, 2, n), jnp.float32)
        yr, yi = fft_split_large(xr, xi, interpret=True)
        assert yr.shape == (2, 2, n)
        got = (np.asarray(yr[1, 0], np.float64)
               + 1j * np.asarray(yi[1, 0], np.float64))
        want = np.fft.fft(np.asarray(xr[1, 0], np.float64))
        assert _snr(got, want) > 120.0

    def test_supported_range(self):
        assert supported_large(MIN_N) and supported_large(MAX_N)
        assert not supported_large(MIN_N // 2)
        assert not supported_large(MAX_N * 2)
        assert not supported_large(3 * (1 << 18))
        with pytest.raises(ValueError):
            fft_split_large(jnp.zeros((1, 1000), jnp.float32),
                            jnp.zeros((1, 1000), jnp.float32),
                            interpret=True)


class TestSpectralFilterLarge:
    def test_matches_reference_sandwich(self):
        from fftlab.kernels.fourstep_vmem import spectral_filter_large

        n = 1 << 18
        rng = np.random.default_rng(11)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        hr = jnp.asarray(rng.standard_normal(n), jnp.float32)
        hi = jnp.asarray(rng.standard_normal(n), jnp.float32)
        yr, yi = spectral_filter_large(xr, xi, hr, hi, interpret=True)
        x = np.asarray(xr[0], np.float64) + 1j * np.asarray(xi[0], np.float64)
        h = np.asarray(hr, np.float64) + 1j * np.asarray(hi, np.float64)
        want = np.fft.ifft(np.fft.fft(x) * h)
        got = np.asarray(yr[0], np.float64) + 1j * np.asarray(yi[0], np.float64)
        assert _snr(got, want) > 110.0

    @pytest.mark.parametrize("n", [1 << 18, 1 << 19])
    def test_blocked_sandwich_matches(self, n):
        """The fused-layout sandwich (forward writes blocked column
        chunks, inverse with swapped sides reads them directly) equals
        the natural-order sandwich for square and non-square sides."""
        from fftlab.kernels.fourstep_vmem import spectral_filter_large

        rng = np.random.default_rng(n % 83)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        hr = jnp.asarray(rng.standard_normal(n), jnp.float32)
        hi = jnp.asarray(rng.standard_normal(n), jnp.float32)
        yr, yi = spectral_filter_large(xr, xi, hr, hi, interpret=True,
                                       blocked=True)
        x = np.asarray(xr[0], np.float64) + 1j * np.asarray(xi[0], np.float64)
        h = np.asarray(hr, np.float64) + 1j * np.asarray(hi, np.float64)
        want = np.fft.ifft(np.fft.fft(x) * h)
        got = np.asarray(yr[0], np.float64) + 1j * np.asarray(yi[0], np.float64)
        assert _snr(got, want) > 110.0
        br, bi = spectral_filter_large(xr, xi, hr, hi, interpret=True,
                                       blocked=False)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(br),
                                   rtol=1e-4, atol=1e-3)

    def test_identity_response(self):
        from fftlab.kernels.fourstep_vmem import spectral_filter_large

        n = 1 << 18
        rng = np.random.default_rng(12)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.zeros((2, n), jnp.float32)
        yr, yi = spectral_filter_large(
            xr, xi, jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32),
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(yr), np.asarray(xr), atol=3e-4)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(xi), atol=3e-4)


class TestRfftLarge:
    def test_matches_numpy_rfft(self):
        from fftlab.kernels.fourstep_vmem import rfft_split_large

        n = 1 << 19
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = rfft_split_large(x, interpret=True)
        assert yr.shape == (1, n // 2 + 1)
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        want = np.fft.rfft(np.asarray(x[0], np.float64))
        assert _snr(got, want) > 110.0

    def test_rejects_bad_sizes(self):
        from fftlab.kernels.fourstep_vmem import rfft_split_large

        with pytest.raises(ValueError):
            # n/2 = 2^14 is below the two-pass kernel's floor
            rfft_split_large(jnp.zeros((1, 1 << 15), jnp.float32),
                             interpret=True)
        with pytest.raises(ValueError):
            rfft_split_large(jnp.zeros((1, 12345), jnp.float32),
                             interpret=True)


class TestWidthEnv:
    def test_env_width_clamps_per_pass(self, monkeypatch):
        """FFTLAB_FS_WIDTH sets ONE width for both passes; each pass
        clamps it to the side it CHUNKS (W1 chunks L2, R2 chunks L1),
        so 512 at n=2^17 (L1=256, L2=512) runs with W1=512, R2=256
        instead of being rejected against the wrong side
        (regression: wrong-side validation)."""
        n = 1 << 17  # L1=256, L2=512
        monkeypatch.setenv("FFTLAB_FS_WIDTH", "512")
        rng = np.random.default_rng(21)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_large(xr, xi, interpret=True)
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0

    def test_env_width_rejects_non_lane_multiple(self, monkeypatch):
        monkeypatch.setenv("FFTLAB_FS_WIDTH", "200")
        with pytest.raises(ValueError, match="multiple of 128"):
            fft_split_large(jnp.zeros((1, 1 << 17), jnp.float32),
                            jnp.zeros((1, 1 << 17), jnp.float32),
                            interpret=True)


class TestIrfftLarge:
    def test_roundtrip_and_numpy(self):
        from fftlab.kernels.fourstep_vmem import (
            irfft_split_large,
            rfft_split_large,
        )

        n = 1 << 16
        rng = np.random.default_rng(14)
        x = rng.standard_normal((1, n)).astype(np.float32)
        Xr, Xi = rfft_split_large(jnp.asarray(x), interpret=True)
        y = irfft_split_large(Xr, Xi, interpret=True)
        assert y.shape == (1, n)
        # Round-trip reconstruction (test_all.c:247-287 analog).
        assert _snr(np.asarray(y[0], np.float64), x[0].astype(np.float64)) > 110.0
        # And directly against numpy's irfft on an arbitrary Hermitian
        # spectrum (not just an rfft image).
        h = n // 2 + 1
        Sr = rng.standard_normal((1, h)).astype(np.float32)
        Si = rng.standard_normal((1, h)).astype(np.float32)
        Si[:, 0] = 0.0
        Si[:, -1] = 0.0
        got = irfft_split_large(jnp.asarray(Sr), jnp.asarray(Si),
                                interpret=True)
        want = np.fft.irfft(Sr[0].astype(np.float64)
                            + 1j * Si[0].astype(np.float64), n)
        assert _snr(np.asarray(got[0], np.float64), want) > 110.0

    def test_rejects_bad_sizes(self):
        from fftlab.kernels.fourstep_vmem import irfft_split_large

        with pytest.raises(ValueError):
            # n/2 = 2^14 is below the two-pass kernel's floor
            irfft_split_large(jnp.zeros((1, (1 << 14) + 1), jnp.float32),
                              jnp.zeros((1, (1 << 14) + 1), jnp.float32),
                              interpret=True)
        with pytest.raises(ValueError):
            irfft_split_large(jnp.zeros((1, 100), jnp.float32),
                              jnp.zeros((1, 100), jnp.float32),
                              n=12345, interpret=True)


class TestLargeAD:
    def test_vjp_matches_linearity(self):
        import jax
        from fftlab.kernels.fourstep_vmem import fft_split_large_ad

        n = 1 << 18
        rng = np.random.default_rng(42)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)

        def loss(a, b):
            yr, yi = fft_split_large_ad(a, b, interpret=True)
            return jnp.sum(yr[..., :64]) + jnp.sum(yi[..., :64])

        gr, gi = jax.grad(loss, argnums=(0, 1))(xr, xi)
        # For a linear map, grad = adjoint applied to the cotangent:
        # d(sum of first 64 output bins)/dx = sum of first 64 DFT rows.
        k = np.arange(64).reshape(-1, 1)
        j = np.arange(n).reshape(1, -1)
        W = np.exp(-2j * np.pi * k * j / n)
        want_r = (W.real.sum(0) + W.imag.sum(0))
        np.testing.assert_allclose(np.asarray(gr[0])[:256],
                                   want_r[:256].astype(np.float32),
                                   atol=2e-2)


class TestScaleFolding:
    def test_scaled_forward_matches_postmultiply(self):
        # `scale` folds into the pass-2 tables: same transform scaled,
        # zero extra HBM passes (the bench chain + inverse rely on it).
        n = 1 << 18
        rng = np.random.default_rng(7)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        s = 1.0 / np.sqrt(n)
        yr, yi = fft_split_large(xr, xi, interpret=True)
        sr, si = fft_split_large(xr, xi, interpret=True, scale=s)
        got = (np.asarray(sr[0], np.float64)
               + 1j * np.asarray(si[0], np.float64))
        want = (np.asarray(yr[0], np.float64)
                + 1j * np.asarray(yi[0], np.float64)) * s
        assert _snr(got, want) > 120.0

    def test_inverse_roundtrip_still_unit(self):
        # the inverse 1/n now rides the tables; round-trip must stay 1.
        n = 1 << 18
        rng = np.random.default_rng(8)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_large(xr, xi, interpret=True)
        br, bi = fft_split_large(yr, yi, Direction.INVERSE, interpret=True)
        assert _snr(np.asarray(br[0]), np.asarray(xr[0])) > 110.0
        assert _snr(np.asarray(bi[0]), np.asarray(xi[0])) > 110.0


class TestLanesPass2:
    """lanes=True replaces pass 2's in-VMEM corner turn (whole-slab
    transpose row-major / _unblock_mid per-tile transposes blocked)
    with lane-contraction FFTs (_col_fft_lanes/_row_fft_lanes).
    Different summation order, so allclose/SNR gates."""

    @pytest.mark.parametrize("blocked", [True, False])
    def test_lanes_matches_default_and_oracle(self, blocked):
        n = 1 << 16
        rng = np.random.default_rng(17)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        a = fft_split_large(xr, xi, interpret=True, blocked=blocked,
                            lanes=False)
        b = fft_split_large(xr, xi, interpret=True, blocked=blocked,
                            lanes=True)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=2e-2)
        got = (np.asarray(b[0][0], np.float64)
               + 1j * np.asarray(b[1][0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0
        inv = fft_split_large(*b, Direction.INVERSE, interpret=True,
                              blocked=blocked, lanes=True)
        np.testing.assert_allclose(np.asarray(inv[0]), np.asarray(xr),
                                   atol=3e-4)

    def test_filter_lanes_matches_oracle(self):
        from fftlab.kernels.fourstep_vmem import spectral_filter_large

        n = 1 << 16
        rng = np.random.default_rng(18)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        yr, yi = spectral_filter_large(
            x.real.astype(np.float32), x.imag.astype(np.float32),
            H.real.astype(np.float32), H.imag.astype(np.float32),
            interpret=True, blocked=True, lanes=True)
        got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        want = np.fft.ifft(np.fft.fft(x, axis=-1) * H, axis=-1)
        assert _snr(got, want) > 120.0

    def test_lanes_env_default(self, monkeypatch):
        from fftlab.kernels.fourstep_vmem import _lanes_default

        monkeypatch.setenv("FFTLAB_FS_LANES", "1")
        assert _lanes_default()
        monkeypatch.setenv("FFTLAB_FS_LANES", "0")
        assert not _lanes_default()
