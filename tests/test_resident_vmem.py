"""One-HBM-residency VMEM kernel (kernels/resident_vmem.py), interpret
mode: natural order, forward/inverse, batch handling, scale folding,
route registration."""

import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.core.types import Direction
from fftlab.kernels.resident_vmem import (
    MAX_N,
    MIN_N,
    fft_split_resident,
    supported_resident,
)


def _snr(got, want):
    return 10 * np.log10(
        np.sum(np.abs(want) ** 2)
        / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )


class TestResidentVmem:
    @pytest.mark.parametrize("n", [1 << 15, 1 << 16, 1 << 17, 1 << 19])
    def test_matches_numpy(self, n):
        rng = np.random.default_rng(n % 97)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        yr, yi = fft_split_resident(xr, xi, interpret=True)
        for b in range(2):
            got = (np.asarray(yr[b], np.float64)
                   + 1j * np.asarray(yi[b], np.float64))
            want = np.fft.fft(np.asarray(xr[b], np.float64)
                              + 1j * np.asarray(xi[b], np.float64))
            assert _snr(got, want) > 120.0

    def test_matches_two_pass_kernel(self):
        """Same math as fourstep_vmem, different residency: spectra
        agree to f32 roundoff."""
        from fftlab.kernels.fourstep_vmem import fft_split_large

        n = 1 << 16
        rng = np.random.default_rng(3)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        ar, ai = fft_split_resident(xr, xi, interpret=True)
        br, bi = fft_split_large(xr, xi, interpret=True)
        np.testing.assert_allclose(np.asarray(ar), np.asarray(br),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   atol=2e-2)

    def test_inverse_roundtrip(self):
        n = 1 << 17
        rng = np.random.default_rng(5)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_resident(xr, xi, interpret=True)
        br, bi = fft_split_resident(yr, yi, Direction.INVERSE,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi),
                                   atol=3e-4)

    def test_scale_folds_into_tables(self):
        n = 1 << 15
        rng = np.random.default_rng(7)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_resident(xr, xi, interpret=True)
        sr, si = fft_split_resident(xr, xi, interpret=True, scale=0.5)
        np.testing.assert_allclose(np.asarray(sr), 0.5 * np.asarray(yr),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(si), 0.5 * np.asarray(yi),
                                   rtol=1e-5, atol=1e-4)

    def test_batch_dims_preserved(self):
        n = 1 << 15
        rng = np.random.default_rng(6)
        xr = jnp.asarray(rng.standard_normal((2, 3, n)), jnp.float32)
        xi = jnp.zeros((2, 3, n), jnp.float32)
        yr, yi = fft_split_resident(xr, xi, interpret=True)
        assert yr.shape == (2, 3, n) and yi.shape == (2, 3, n)
        got = (np.asarray(yr[1, 2], np.float64)
               + 1j * np.asarray(yi[1, 2], np.float64))
        want = np.fft.fft(np.asarray(xr[1, 2], np.float64))
        assert _snr(got, want) > 120.0

    def test_out_rows_override(self):
        """Wider strided-write chunks (out_rows > 128) keep the same
        math to f32 roundoff (the phase-B FFT's dot blocking changes
        with R, so not bitwise) — the A/B probe sweeps them on device."""
        n = 1 << 16  # L1 = 256, so out_rows=256 exercises G1=1
        rng = np.random.default_rng(11)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        yr, yi = fft_split_resident(xr, xi, interpret=True)
        wr, wi = fft_split_resident(xr, xi, interpret=True, out_rows=256)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(wr),
                                   rtol=1e-5, atol=1e-2)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(wi),
                                   rtol=1e-5, atol=1e-2)
        got = (np.asarray(wr[0], np.float64)
               + 1j * np.asarray(wi[0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0
        with pytest.raises(ValueError):
            fft_split_resident(xr, xi, interpret=True, out_rows=96)

    @pytest.mark.parametrize("n", [1 << 15, 1 << 17, 1 << 20])
    def test_contiguous_io_variant_matches(self, n):
        """v3 (all-contiguous HBM edges) computes the identical
        transform: same phases, same tables, different delivery."""
        from fftlab.kernels.resident_vmem import fft_split_resident_cio

        rng = np.random.default_rng(n % 89)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        yr, yi = fft_split_resident_cio(xr, xi, interpret=True)
        vr, vi = fft_split_resident(xr, xi, interpret=True)
        np.testing.assert_array_equal(np.asarray(yr), np.asarray(vr))
        np.testing.assert_array_equal(np.asarray(yi), np.asarray(vi))

    def test_contiguous_io_inverse_and_gates(self):
        from fftlab.kernels.resident_vmem import fft_split_resident_cio

        n = 1 << 16
        rng = np.random.default_rng(21)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_resident_cio(xr, xi, interpret=True)
        br, bi = fft_split_resident_cio(yr, yi, Direction.INVERSE,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi),
                                   atol=3e-4)
        with pytest.raises(ValueError):
            fft_split_resident_cio(xr, xi, interpret=True, in_rows=48)
        with pytest.raises(ValueError):
            fft_split_resident_cio(
                jnp.zeros((1, 1 << 14), jnp.float32),
                jnp.zeros((1, 1 << 14), jnp.float32), interpret=True)

    def test_size_gate(self):
        assert not supported_resident(MIN_N // 2)
        assert supported_resident(MIN_N)
        assert supported_resident(MAX_N)
        assert not supported_resident(MAX_N * 2)
        assert not supported_resident(3 * (1 << 14))
        xr = jnp.zeros((1, 1 << 14), jnp.float32)
        with pytest.raises(ValueError):
            fft_split_resident(xr, xr, interpret=True)

    def test_route_registered(self):
        from fftlab.plan.dispatch import ROUTES, run_route

        assert "resident_vmem" in ROUTES
        assert "resident_cio" in ROUTES
        n = 1 << 15
        rng = np.random.default_rng(9)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        # On CPU the routes still run (interpret resolves inside the
        # kernel wrapper via default_backend).
        for route in ("resident_vmem", "resident_cio"):
            yr, yi = run_route(route, xr, xi, Direction.FORWARD)
            got = (np.asarray(yr[0], np.float64)
                   + 1j * np.asarray(yi[0], np.float64))
            assert _snr(got, want) > 120.0, route


class TestResidentFilter:
    def _oracle(self, x, H):
        return np.fft.ifft(np.fft.fft(x, axis=-1) * H, axis=-1)

    @pytest.mark.parametrize("n", [1 << 15, 1 << 17])
    def test_matches_oracle(self, n):
        from fftlab.kernels.resident_vmem import spectral_filter_resident

        rng = np.random.default_rng(n % 31)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        yr, yi = spectral_filter_resident(
            x.real.astype(np.float32), x.imag.astype(np.float32),
            H.real.astype(np.float32), H.imag.astype(np.float32),
            interpret=True)
        got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        want = self._oracle(x, H)
        assert _snr(got, want) > 120.0

    def test_matches_two_launch_sandwich(self):
        from fftlab.kernels.fourstep_vmem import spectral_filter_large
        from fftlab.kernels.resident_vmem import spectral_filter_resident

        n = 1 << 16
        rng = np.random.default_rng(4)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        hr = jnp.asarray(rng.standard_normal(n), jnp.float32)
        hi = jnp.asarray(rng.standard_normal(n), jnp.float32)
        ar, ai = spectral_filter_resident(xr, xi, hr, hi, interpret=True)
        br, bi = spectral_filter_large(xr, xi, hr, hi, interpret=True)
        np.testing.assert_allclose(np.asarray(ar), np.asarray(br),
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   atol=1e-2)

    def test_h_stream_path(self):
        """At 2^20 (8 MB resident matrix) H is consumed as BlockSpec
        chunks like everywhere else — gate the headline size."""
        from fftlab.kernels.resident_vmem import spectral_filter_resident

        n = 1 << 20
        rng = np.random.default_rng(8)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        yr, yi = spectral_filter_resident(
            x.real.astype(np.float32)[None], x.imag.astype(np.float32)[None],
            H.real.astype(np.float32), H.imag.astype(np.float32),
            interpret=True)
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        assert _snr(got, self._oracle(x, H)) > 120.0

    @pytest.mark.parametrize("n", [1 << 15, 1 << 17])
    def test_contiguous_io_filter_matches(self, n):
        """v3 filter (contiguous edges + pre-permuted H chunks) is the
        identical sandwich."""
        from fftlab.kernels.resident_vmem import (
            spectral_filter_resident,
            spectral_filter_resident_cio,
        )

        rng = np.random.default_rng(n % 53)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        args = (x.real.astype(np.float32), x.imag.astype(np.float32),
                H.real.astype(np.float32), H.imag.astype(np.float32))
        ar, ai = spectral_filter_resident_cio(*args, interpret=True)
        br, bi = spectral_filter_resident(*args, interpret=True)
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(br))
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))
        got = np.asarray(ar, np.float64) + 1j * np.asarray(ai, np.float64)
        assert _snr(got, self._oracle(x, H)) > 120.0

    def test_size_gate(self):
        from fftlab.kernels.resident_vmem import (
            spectral_filter_resident,
            spectral_filter_resident_cio,
        )

        xr = jnp.zeros((1, 1 << 14), jnp.float32)
        h = jnp.zeros(1 << 14, jnp.float32)
        with pytest.raises(ValueError):
            spectral_filter_resident(xr, xr, h, h, interpret=True)
        with pytest.raises(ValueError):
            spectral_filter_resident_cio(xr, xr, h, h, interpret=True)


class TestV4Layout:
    def test_v4_bitwise_equals_v2(self):
        """v4 (transposed resident matrix, static-sliced phase-A
        transposes) is the same math in a different staging — bitwise
        equality with v2 in interpret mode, both directions."""
        from fftlab.core.types import INVERSE
        from fftlab.kernels.resident_vmem import fft_split_resident

        rng = np.random.default_rng(44)
        n = 1 << 16
        xr = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
        for d in (None, INVERSE):
            kw = {} if d is None else {"direction": d}
            v2 = fft_split_resident(xr, xi, interpret=True, **kw)
            v4 = fft_split_resident(xr, xi, interpret=True,
                                    layout="v4", **kw)
            np.testing.assert_array_equal(np.asarray(v2[0]),
                                          np.asarray(v4[0]))
            np.testing.assert_array_equal(np.asarray(v2[1]),
                                          np.asarray(v4[1]))

    def test_v4_scale_and_oracle(self):
        from fftlab.kernels.resident_vmem import fft_split_resident

        rng = np.random.default_rng(45)
        n = 1 << 15
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_resident(xr, xi, interpret=True, layout="v4",
                                    scale=0.5)
        got = np.asarray(yr[0], np.float64) + 1j * np.asarray(yi[0],
                                                              np.float64)
        want = 0.5 * np.fft.fft(np.asarray(xr[0], np.float64)
                                + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0

    def test_bad_layout_raises(self):
        from fftlab.kernels.resident_vmem import fft_split_resident

        with pytest.raises(ValueError, match="layout"):
            fft_split_resident(jnp.zeros((1, 1 << 15), jnp.float32),
                               jnp.zeros((1, 1 << 15), jnp.float32),
                               interpret=True, layout="v9")


class TestV6Layout:
    """v6 = zero in-VMEM transposes: phase B's FFT runs in
    lane-contraction form (fourstep_vmem._col_fft_lanes), the corner
    turn riding the MXU contraction axes. Different summation order
    than v2 (unbalanced factors), so allclose/SNR gates, not bitwise."""

    @pytest.mark.parametrize("n", [1 << 15, 1 << 16, 1 << 19])
    def test_v6_oracle_and_matches_v2(self, n):
        from fftlab.core.types import INVERSE
        from fftlab.kernels.resident_vmem import fft_split_resident

        rng = np.random.default_rng(n % 61)
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        yr, yi = fft_split_resident(xr, xi, interpret=True, layout="v6")
        v2r, v2i = fft_split_resident(xr, xi, interpret=True)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(v2r),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(v2i),
                                   atol=2e-2)
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0
        br, bi = fft_split_resident(yr, yi, INVERSE, interpret=True,
                                    layout="v6")
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi),
                                   atol=3e-4)

    def test_v6_scale_and_route(self):
        from fftlab.core.types import Direction
        from fftlab.kernels.resident_vmem import fft_split_resident
        from fftlab.plan.dispatch import ROUTES, run_route

        assert "resident_v6" in ROUTES
        n = 1 << 15
        rng = np.random.default_rng(46)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        sr, si = fft_split_resident(xr, xi, interpret=True, layout="v6",
                                    scale=0.5)
        yr, yi = fft_split_resident(xr, xi, interpret=True, layout="v6")
        np.testing.assert_allclose(np.asarray(sr), 0.5 * np.asarray(yr),
                                   rtol=1e-5, atol=1e-4)
        rr, ri = run_route("resident_v6", xr, xi, Direction.FORWARD)
        got = (np.asarray(rr[0], np.float64)
               + 1j * np.asarray(ri[0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0


class TestV5Filter:
    """v5 = the transpose-free fused sandwich (both corner turns as
    lane contractions; in-place square-tile mid store)."""

    def _oracle(self, x, H):
        return np.fft.ifft(np.fft.fft(x, axis=-1) * H, axis=-1)

    @pytest.mark.parametrize("n", [1 << 15, 1 << 17, 1 << 20])
    def test_matches_oracle_and_v2(self, n):
        from fftlab.kernels.resident_vmem import (
            spectral_filter_resident,
            spectral_filter_resident_v5,
        )

        rng = np.random.default_rng(n % 43)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        args = (x.real.astype(np.float32), x.imag.astype(np.float32),
                H.real.astype(np.float32), H.imag.astype(np.float32))
        ar, ai = spectral_filter_resident_v5(*args, interpret=True)
        got = np.asarray(ar, np.float64) + 1j * np.asarray(ai, np.float64)
        assert _snr(got, self._oracle(x, H)) > 120.0
        if n <= 1 << 17:  # keep the interpret-mode cross-check cheap
            br, bi = spectral_filter_resident(*args, interpret=True)
            np.testing.assert_allclose(np.asarray(ar), np.asarray(br),
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                       atol=2e-4)

    def test_size_gate_and_dispatch_env(self, monkeypatch):
        from fftlab.kernels.resident_vmem import spectral_filter_resident_v5
        from fftlab.plan.dispatch import resident_filter_enabled

        xr = jnp.zeros((1, 1 << 14), jnp.float32)
        h = jnp.zeros(1 << 14, jnp.float32)
        with pytest.raises(ValueError):
            spectral_filter_resident_v5(xr, xr, h, h, interpret=True)
        monkeypatch.setenv("FFTLAB_RESIDENT_FILTER", "v5")
        assert resident_filter_enabled() == "v5"
        monkeypatch.setenv("FFTLAB_RESIDENT_FILTER", "3")
        assert resident_filter_enabled() == "v5"
        monkeypatch.setenv("FFTLAB_RESIDENT_FILTER", "0")
        assert resident_filter_enabled() is None


class TestV7Filter:
    """v7 = the fused sandwich with v4 transpose placement (corner
    turns on the DMA-overlapped phases; pure-compute mid with in-place
    slot store)."""

    def _oracle(self, x, H):
        return np.fft.ifft(np.fft.fft(x, axis=-1) * H, axis=-1)

    @pytest.mark.parametrize("n", [1 << 15, 1 << 17, 1 << 20])
    def test_matches_oracle_and_v2(self, n):
        from fftlab.kernels.resident_vmem import (
            spectral_filter_resident,
            spectral_filter_resident_v7,
        )

        rng = np.random.default_rng(n % 41)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        args = (x.real.astype(np.float32), x.imag.astype(np.float32),
                H.real.astype(np.float32), H.imag.astype(np.float32))
        ar, ai = spectral_filter_resident_v7(*args, interpret=True)
        got = np.asarray(ar, np.float64) + 1j * np.asarray(ai, np.float64)
        assert _snr(got, self._oracle(x, H)) > 120.0
        if n <= 1 << 17:  # keep the interpret-mode cross-check cheap
            br, bi = spectral_filter_resident(*args, interpret=True)
            np.testing.assert_allclose(np.asarray(ar), np.asarray(br),
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                       atol=2e-4)

    def test_prec_3x_passes_gate(self):
        from fftlab.kernels.resident_vmem import spectral_filter_resident_v7

        n = 1 << 15
        rng = np.random.default_rng(9)
        x = rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
        H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ar, ai = spectral_filter_resident_v7(
            x.real.astype(np.float32), x.imag.astype(np.float32),
            H.real.astype(np.float32), H.imag.astype(np.float32),
            interpret=True, prec="3x")
        got = np.asarray(ar, np.float64) + 1j * np.asarray(ai, np.float64)
        assert _snr(got, self._oracle(x, H)) > 95.0

    def test_size_gate_and_dispatch_env(self, monkeypatch):
        from fftlab.kernels.resident_vmem import spectral_filter_resident_v7
        from fftlab.plan.dispatch import resident_filter_enabled

        xr = jnp.zeros((1, 1 << 14), jnp.float32)
        h = jnp.zeros(1 << 14, jnp.float32)
        with pytest.raises(ValueError):
            spectral_filter_resident_v7(xr, xr, h, h, interpret=True)
        monkeypatch.setenv("FFTLAB_RESIDENT_FILTER", "v7")
        assert resident_filter_enabled() == "v7"
        monkeypatch.setenv("FFTLAB_RESIDENT_FILTER", "4")
        assert resident_filter_enabled() == "v7"
