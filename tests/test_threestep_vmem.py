"""Three-pass huge-n kernel (kernels/threestep_vmem.py), interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.core.types import Direction
from fftlab.kernels.threestep_vmem import (
    blocked_huge_feasible,
    fft_split_huge,
    supported_huge,
)


def _snr(got, want):
    return 10 * np.log10(
        np.sum(np.abs(want) ** 2)
        / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )


class TestThreestep:
    def test_matches_numpy_2e23(self):
        n = 1 << 23
        rng = np.random.default_rng(23)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_huge(xr, xi, interpret=True)
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 115.0

    def test_inverse_roundtrip(self):
        n = 1 << 23
        rng = np.random.default_rng(5)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_huge(xr, xi, interpret=True)
        br, bi = fft_split_huge(yr, yi, Direction.INVERSE, interpret=True)
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr), atol=1e-3)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi), atol=1e-3)

    def test_blocked_matches_numpy(self):
        """Blocked intermediates hit the same accuracy as row-major vs
        the float64 oracle (same math, DMA-shaped layouts; pass 2's
        matmul width differs so bits may not)."""
        n = 1 << 23
        rng = np.random.default_rng(31)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        assert blocked_huge_feasible(n)
        yr, yi = fft_split_huge(xr, xi, interpret=True, blocked=True)
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 115.0

    def test_blocked_inverse_roundtrip(self):
        n = 1 << 23
        rng = np.random.default_rng(37)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_huge(xr, xi, interpret=True, blocked=True)
        br, bi = fft_split_huge(yr, yi, Direction.INVERSE,
                                interpret=True, blocked=True)
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr), atol=1e-3)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi), atol=1e-3)

    def test_blocked_infeasible_falls_back(self):
        # 2^26 -> F2=512: blocked slabs would blow VMEM; must still work.
        assert not blocked_huge_feasible(1 << 26)
        n = 1 << 23
        xr = jnp.zeros((1, n), jnp.float32)
        yr, yi = fft_split_huge(xr, xr, interpret=True, blocked=True)
        assert yr.shape == (1, n)

    def test_supported_range(self):
        assert supported_huge(1 << 23) and supported_huge(1 << 26)
        # 2^21/2^22 joined in r4 (the two-pass kernel's 2^22 compile
        # crash at batch>1 moved 2^22 here)
        assert supported_huge(1 << 21) and supported_huge(1 << 22)
        assert not supported_huge(1 << 20)
        assert not supported_huge(1 << 27)
        with pytest.raises(ValueError):
            fft_split_huge(jnp.zeros((1, 1 << 20), jnp.float32),
                           jnp.zeros((1, 1 << 20), jnp.float32),
                           interpret=True)


class TestLanesPass3:
    """lanes=True runs pass 3 as a lane-axis FFT (transpose-free; the
    corner turn rides the MXU contraction axes — see
    _pass_row_lanes_kernel). Different summation order than the
    transpose+column default, so allclose/SNR gates."""

    def test_lanes_matches_default_and_oracle(self):
        from fftlab.core.types import Direction
        from fftlab.kernels.threestep_vmem import fft_split_huge

        n = 1 << 23
        rng = np.random.default_rng(13)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        a = fft_split_huge(xr, xi, interpret=True, lanes=False)
        b = fft_split_huge(xr, xi, interpret=True, lanes=True)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=5e-2)
        got = (np.asarray(b[0][0], np.float64)
               + 1j * np.asarray(b[1][0], np.float64))
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 120.0
        inv = fft_split_huge(*b, Direction.INVERSE, interpret=True,
                             lanes=True)
        np.testing.assert_allclose(np.asarray(inv[0]), np.asarray(xr),
                                   atol=3e-4)

    def test_lanes_env_default(self, monkeypatch):
        """FFTLAB_TS_LANES resolves OUTSIDE jit; blocked=True overrides
        lanes (the blocked variant has its own pass-3 structure)."""
        from fftlab.kernels.threestep_vmem import fft_split_huge

        n = 1 << 23
        rng = np.random.default_rng(14)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        monkeypatch.setenv("FFTLAB_TS_LANES", "1")
        a = fft_split_huge(xr, xi, interpret=True)
        b = fft_split_huge(xr, xi, interpret=True, lanes=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestScaleFoldingHuge:
    def test_scaled_forward_matches_postmultiply(self):
        n = 1 << 23
        rng = np.random.default_rng(9)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        s = 1.0 / np.sqrt(n)
        yr, yi = fft_split_huge(xr, xi, interpret=True)
        sr, si = fft_split_huge(xr, xi, interpret=True, scale=s)
        got = (np.asarray(sr[0], np.float64)
               + 1j * np.asarray(si[0], np.float64))
        want = (np.asarray(yr[0], np.float64)
                + 1j * np.asarray(yi[0], np.float64)) * s
        assert _snr(got, want) > 120.0


class TestBurstWidths:
    def test_widened_bursts_match_oracle(self, monkeypatch):
        """FFTLAB_TS_W1/R3 widen the strided DMA bursts without changing
        the math (rank-1 twiddle regroups -> f32 roundoff only)."""
        n = 1 << 23
        rng = np.random.default_rng(13)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        xr = jnp.asarray(x.real, jnp.float32)[None]
        xi = jnp.asarray(x.imag, jnp.float32)[None]
        monkeypatch.setenv("FFTLAB_TS_W1", "256")
        monkeypatch.setenv("FFTLAB_TS_R3", "256")  # clamps: F1=128 at 2^23
        yr, yi = fft_split_huge(xr, xi, interpret=True, blocked=True)
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        assert _snr(got, np.fft.fft(x)) > 120.0

    def test_burst_width_clamped_to_divisor(self, monkeypatch):
        from fftlab.kernels.threestep_vmem import _burst_widths

        monkeypatch.setenv("FFTLAB_TS_W1", "512")
        monkeypatch.setenv("FFTLAB_TS_R3", "512")
        w1, r3 = _burst_widths(1 << 23)  # F1=128, F3=256
        assert w1 == 256 and r3 == 128
        monkeypatch.setenv("FFTLAB_TS_W1", "129")
        with pytest.raises(ValueError):
            _burst_widths(1 << 23)

    def test_non_pow2_multiple_clamps_to_lanes(self, monkeypatch):
        """A non-pow2 multiple of 128 (e.g. 384) must clamp to a width
        that still divides the side AND stays a multiple of 128 —
        halving 384 naively walks to 1 (regression: rank-1 lane-dim-1
        blocks)."""
        from fftlab.kernels.threestep_vmem import _burst_widths

        monkeypatch.setenv("FFTLAB_TS_W1", "384")
        monkeypatch.setenv("FFTLAB_TS_R3", "384")
        w1, r3 = _burst_widths(1 << 23)  # F1=128, F3=256
        assert w1 == 128 and r3 == 128
