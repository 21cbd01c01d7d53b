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
    @pytest.mark.parametrize("n", [1 << 18, 1 << 19])
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
