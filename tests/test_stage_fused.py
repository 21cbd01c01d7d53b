"""Fused-stage kernel + pipeline tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.core.twiddle import dft_matrix_np, stage_twiddle_np
from fftlab.core.types import Direction
from fftlab.kernels.stage_fused import fft_split_pipeline, fused_stage


def _snr(got, want):
    return 10 * np.log10(
        np.sum(np.abs(want) ** 2) / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )


class TestFusedStage:
    @pytest.mark.parametrize("r,M", [(64, 2048), (128, 1024), (32, 128)])
    def test_matches_einsum_oracle(self, r, M):
        rng = np.random.default_rng(r + M)
        n = r * M
        xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        yr, yi = fused_stage(xr, xi, r=r, interpret=True)
        x = (np.asarray(xr) + 1j * np.asarray(xi)).reshape(2, r, M)
        F = dft_matrix_np(r, Direction.FORWARD)
        tw = stage_twiddle_np(r, M, Direction.FORWARD)
        want = (np.einsum("ba,Bam->Bbm", F, x) * tw).reshape(2, n)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert _snr(got, want) > 115.0

    def test_no_twiddle(self):
        rng = np.random.default_rng(0)
        r, M = 64, 256
        n = r * M
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.zeros((1, n), jnp.float32)
        yr, yi = fused_stage(xr, xi, r=r, twiddle=False, interpret=True)
        x = np.asarray(xr).reshape(1, r, M)
        F = dft_matrix_np(r, Direction.FORWARD)
        want = np.einsum("ba,Bam->Bbm", F, x).reshape(1, n)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert _snr(got, want) > 115.0


class TestPipeline:
    @pytest.mark.parametrize("n,factors", [
        (1 << 20, (64, 128, 128)),
        (1 << 17, (8, 128, 128)),
        (1 << 15, (2, 128, 128)),
    ])
    def test_matches_numpy(self, n, factors):
        rng = np.random.default_rng(n % 997)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_pipeline(xr, xi, factors=factors, interpret=True)
        got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
        want = np.fft.fft(
            np.asarray(xr[0], np.float64) + 1j * np.asarray(xi[0], np.float64)
        )
        assert _snr(got, want) > 110.0

    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(5)
        n = 1 << 15
        factors = (2, 128, 128)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_pipeline(xr, xi, factors=factors, interpret=True)
        br, bi = fft_split_pipeline(yr, yi, Direction.INVERSE,
                                    factors=factors, interpret=True)
        np.testing.assert_allclose(np.asarray(br), np.asarray(xr), atol=2e-4)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(xi), atol=2e-4)

    def test_bad_factor_order_raises(self):
        with pytest.raises(ValueError):
            fft_split_pipeline(
                jnp.zeros((1, 1 << 20), jnp.float32),
                jnp.zeros((1, 1 << 20), jnp.float32),
                factors=(128, 128, 64), interpret=True,
            )


class TestNonDivisibleColTile:
    def test_trailing_tiles_written(self):
        # Advisor repro (ADVICE.md r1): r=2, n=3072 -> M=1536, 12 column
        # tiles; col_tile=8 does not divide 12.  The fix picks the
        # largest divisor (6) so every tile is written.
        rng = np.random.default_rng(12)
        n = 3072
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fused_stage(xr, xi, r=2, col_tile=8, interpret=True)
        got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
        assert np.all(np.isfinite(got))
        # Reference: one radix-2 stage + twiddle on the leading digit.
        x = (np.asarray(xr[0], np.float64)
             + 1j * np.asarray(xi[0], np.float64)).reshape(2, n // 2)
        F = np.exp(-2j * np.pi * np.outer(np.arange(2), np.arange(2)) / 2)
        y = F @ x
        tw = np.exp(-2j * np.pi
                    * np.outer(np.arange(2), np.arange(n // 2)) / n)
        want = (y * tw).reshape(-1)
        assert _snr(got, want) > 110.0

    def test_pipeline_factors_satisfy_stage_constraint(self):
        """Compile-gate r3 finding: plan_factors' balanced splits (e.g.
        (64, 32, 32) at 2^16) violate the pipeline's M % 128 per-stage
        bound and raise at call time. pipeline_factors must produce a
        valid, product-preserving factorization for every supported
        pow2, and the pipeline must accept it."""
        from fftlab.kernels.stage_fused import (
            fft_split_pipeline,
            pipeline_factors,
        )

        for e in range(8, 27):
            n = 1 << e
            f = pipeline_factors(n)
            assert int(np.prod(f)) == n
            rem = n
            for r in f[:-1]:
                assert (rem // r) % 128 == 0, (n, f, r)
                rem //= r
        # the size that used to raise, end to end
        n = 1 << 16
        rng = np.random.default_rng(16)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        yr, yi = fft_split_pipeline(xr, xi, factors=pipeline_factors(n),
                                    interpret=True)
        got = np.asarray(yr[0], np.float64) + 1j * np.asarray(yi[0],
                                                              np.float64)
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
        assert _snr(got, want) > 110.0
        with pytest.raises(ValueError):
            pipeline_factors(1000)  # non-pow2
