"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4:
the "fake backend" the reference lacks). Every sharded transform must
equal its single-device counterpart and the naive oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.algos.dft import naive_dft
from fftlab.core.types import Direction
from fftlab.dist.four_step import four_step_fft, four_step_fft_sharded, split_n
from fftlab.dist.mesh import make_mesh, shard_batch
from fftlab.dist.overlap_save import (
    overlap_save_filter_sharded,
    overlap_save_filterbank_sharded,
)
from fftlab.dist.stft import stft_sharded
from fftlab.dist.welch import welch_psd_sharded
from fftlab.dsp.convolution import fft_convolution
from fftlab.dsp.spectrum import welch_psd


def _rand_complex(rng, shape, dtype=np.complex128):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(dtype)


# ---------------------------------------------------------------------------
# four-step
# ---------------------------------------------------------------------------


class TestFourStep:
    @pytest.mark.parametrize("n", [64, 256, 4096, 12 * 12])
    def test_single_device_matches_oracle(self, n):
        rng = np.random.default_rng(0)
        x = _rand_complex(rng, (n,))
        got = np.asarray(four_step_fft(x))
        want = np.asarray(naive_dft(x))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-8 * n)

    def test_single_device_inverse_roundtrip(self):
        rng = np.random.default_rng(1)
        x = _rand_complex(rng, (1024,))
        y = four_step_fft(four_step_fft(x), Direction.INVERSE)
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-10)

    @pytest.mark.parametrize("n", [4096, 65536])
    def test_sharded_matches_single(self, mesh8, n):
        rng = np.random.default_rng(2)
        x = _rand_complex(rng, (n,))
        got = np.asarray(
            four_step_fft_sharded(x, mesh8, axis_name="x")
        )
        want = np.asarray(four_step_fft(x))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-9 * n)

    def test_sharded_inverse_scaling(self, mesh8):
        rng = np.random.default_rng(3)
        x = _rand_complex(rng, (4096,))
        X = four_step_fft_sharded(x, mesh8, axis_name="x")
        back = four_step_fft_sharded(X, mesh8, axis_name="x",
                                     direction=Direction.INVERSE)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-9)

    def test_sharded_batched(self, mesh8):
        rng = np.random.default_rng(4)
        x = _rand_complex(rng, (3, 4096))
        got = np.asarray(four_step_fft_sharded(x, mesh8, axis_name="x"))
        want = np.asarray(four_step_fft(x))
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_matrix_form_output(self, mesh8):
        rng = np.random.default_rng(5)
        n = 4096
        x = _rand_complex(rng, (n,))
        y = four_step_fft_sharded(x, mesh8, axis_name="x", flatten=False)
        n1, n2 = split_n(n)
        assert y.shape == (n1, n2)
        want = np.asarray(four_step_fft(x)).reshape(n1, n2)
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-8)

    def test_split_n(self):
        assert split_n(2**24) == (4096, 4096)
        assert split_n(2**13) == (64, 128)
        assert split_n(100, 10) == (10, 10)
        with pytest.raises(ValueError):
            split_n(100, 7)

    def test_indivisible_mesh_raises(self, mesh8):
        with pytest.raises(ValueError):
            four_step_fft_sharded(jnp.zeros(36, jnp.complex64), mesh8,
                                  axis_name="x", n1=6)


# ---------------------------------------------------------------------------
# overlap-save halo filtering
# ---------------------------------------------------------------------------


class TestOverlapSaveSharded:
    @pytest.mark.parametrize("nh", [1, 7, 33, 129])
    def test_matches_linear_convolution(self, mesh8, nh):
        rng = np.random.default_rng(10)
        n = 8192
        x = rng.standard_normal(n)
        h = rng.standard_normal(nh)
        got = np.asarray(overlap_save_filter_sharded(x, h, mesh8, "x"))
        want = np.asarray(fft_convolution(x, h))[:n]
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_complex_input(self, mesh8):
        rng = np.random.default_rng(11)
        n = 4096
        x = _rand_complex(rng, (n,))
        h = rng.standard_normal(17)
        got = np.asarray(overlap_save_filter_sharded(x, h, mesh8, "x"))
        want = np.asarray(fft_convolution(x, h))[:n]
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_batched_channels(self, mesh8):
        rng = np.random.default_rng(12)
        x = rng.standard_normal((4, 4096))
        h = rng.standard_normal(21)
        got = np.asarray(overlap_save_filter_sharded(x, h, mesh8, "x"))
        want = np.asarray(fft_convolution(x, h))[..., :4096]
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_filterbank_2d_mesh(self):
        mesh = make_mesh({"dp": 2, "sp": 4})
        rng = np.random.default_rng(13)
        c, n, nh = 6, 4096, 31
        x = rng.standard_normal((c, n))
        hb = rng.standard_normal((c, nh))
        got = np.asarray(overlap_save_filterbank_sharded(x, hb, mesh))
        for ch in range(c):
            want = np.asarray(fft_convolution(x[ch], hb[ch]))[:n]
            np.testing.assert_allclose(got[ch], want, atol=1e-8,
                                       err_msg=f"channel {ch}")

    def test_too_short_chunk_raises(self, mesh8):
        with pytest.raises(ValueError):
            overlap_save_filter_sharded(
                jnp.zeros(64), jnp.zeros(65), mesh8, "x"
            )

    def test_complex_taps(self, mesh8):
        """Complex filter taps keep their imaginary part (regression:
        a real-dtype astype silently filtered by real(h))."""
        rng = np.random.default_rng(14)
        n = 4096
        x = rng.standard_normal(n)
        h = _rand_complex(rng, (17,))
        got = np.asarray(overlap_save_filter_sharded(x, h, mesh8, "x"))
        want = np.asarray(fft_convolution(x, h))[:n]
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_filterbank_complex_taps(self):
        mesh = make_mesh({"dp": 2, "sp": 4})
        rng = np.random.default_rng(15)
        c, n = 2, 4096
        x = rng.standard_normal((c, n))
        hb = _rand_complex(rng, (c, 9))
        got = np.asarray(overlap_save_filterbank_sharded(x, hb, mesh))
        for ch in range(c):
            want = np.asarray(fft_convolution(x[ch], hb[ch]))[:n]
            np.testing.assert_allclose(got[ch], want, atol=1e-8)

    def test_filterbank_too_short_chunk_raises(self):
        """The filterbank validates the time chunk against the halo
        (regression: undersized chunks silently mis-filtered)."""
        mesh = make_mesh({"dp": 2, "sp": 4})
        with pytest.raises(ValueError, match="halo"):
            overlap_save_filterbank_sharded(
                jnp.zeros((2, 2048)), jnp.zeros((2, 1025)), mesh
            )


# ---------------------------------------------------------------------------
# sharded Welch PSD
# ---------------------------------------------------------------------------


class TestWelchSharded:
    def test_rejects_batched_input(self, mesh8):
        """Batched input would silently slice the batch axis as time
        (regression); it must raise instead."""
        from fftlab.dist.welch import welch_psd_sharded

        with pytest.raises(ValueError, match="1D"):
            welch_psd_sharded(jnp.zeros((4, 8192)), mesh8, "x")

    def test_matches_single_device(self, mesh8):
        rng = np.random.default_rng(20)
        x = rng.standard_normal(8192)
        f1, p1 = welch_psd_sharded(x, mesh8, "x", sample_rate=1000.0,
                                   window_size=256, overlap=0.5)
        f2, p2 = welch_psd(x, sample_rate=1000.0, window_size=256,
                           overlap=0.5)
        np.testing.assert_allclose(f1, f2)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-6, atol=1e-12)

    def test_tone_peak(self, mesh8):
        fs, f0, n = 1024.0, 128.0, 16384
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * f0 * t)
        freqs, psd = welch_psd_sharded(x, mesh8, "x", sample_rate=fs,
                                       window_size=512)
        assert abs(freqs[int(np.argmax(np.asarray(psd)))] - f0) < fs / 512


# ---------------------------------------------------------------------------
# sharded STFT
# ---------------------------------------------------------------------------


class TestStftSharded:
    def test_matches_reference_framing(self, mesh8):
        rng = np.random.default_rng(30)
        n, fft_size, hop = 16384, 512, 256
        x = rng.standard_normal(n)
        got = np.asarray(stft_sharded(x, mesh8, "x", fft_size, hop))
        # Reference framing: starts at k*hop, zero-extended tail.
        n_frames = n // hop
        xp = np.pad(x, (0, fft_size))
        from fftlab.core.window import hann

        w = hann(fft_size)
        want = np.stack([
            np.fft.fft(xp[k * hop : k * hop + fft_size] * w)[: fft_size // 2 + 1]
            for k in range(n_frames)
        ])
        assert got.shape == (n_frames, fft_size // 2 + 1)
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_hop_equals_frame(self, mesh8):
        rng = np.random.default_rng(31)
        x = rng.standard_normal(8192)
        got = np.asarray(stft_sharded(x, mesh8, "x", 256, 256,
                                      window="rectangular"))
        want = np.stack([
            np.fft.fft(x[k * 256 : (k + 1) * 256])[:129]
            for k in range(32)
        ])
        np.testing.assert_allclose(got, want, atol=1e-8)


# ---------------------------------------------------------------------------
# DP batch sharding
# ---------------------------------------------------------------------------


class TestBatchSharding:
    def test_dp_batched_fft(self, mesh8):
        from fftlab.algos.stockham import stockham_fft

        rng = np.random.default_rng(40)
        x = _rand_complex(rng, (8, 1024), np.complex64)
        xs = shard_batch(x, mesh8, "x")
        got = np.asarray(jax.jit(stockham_fft)(xs))
        want = np.asarray(jax.jit(stockham_fft)(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


class TestShardedPlan:
    def test_plan_executes_on_mesh(self, mesh8):
        from fftlab.plan.api import plan_dft_1d_sharded

        rng = np.random.default_rng(50)
        n = 4096
        x = _rand_complex(rng, (n,))
        plan = plan_dft_1d_sharded(n, mesh8, axis_name="x")
        assert "four_step[x=8]" == plan.algorithm
        got = np.asarray(plan.execute(x))
        np.testing.assert_allclose(got, np.asarray(naive_dft(x)),
                                   atol=1e-8 * n)

    def test_indivisible_raises(self, mesh8):
        from fftlab.plan.api import plan_dft_1d_sharded

        with pytest.raises(ValueError):
            plan_dft_1d_sharded(36, mesh8, axis_name="x")


class TestLargeTransform:
    def test_four_step_16m_sharded(self, mesh8):
        """BASELINE config 5 scale: 16M-pt single transform over the
        mesh (complex64 to keep CPU memory modest); spot-checked against
        numpy on a strided sample."""
        n = 1 << 24
        rng = np.random.default_rng(99)
        # Structured input so the spectrum is analytic: two tones.
        k1, k2 = 12345, 4000000
        t = np.arange(n)
        x = (np.exp(2j * np.pi * k1 * t / n)
             + 0.5 * np.exp(2j * np.pi * k2 * t / n)).astype(np.complex64)
        X = np.asarray(four_step_fft_sharded(
            jnp.asarray(x), mesh8, axis_name="x"
        ))
        # Peaks of ~n and ~n/2 at the tone bins; elsewhere near zero.
        assert abs(X[k1]) > 0.9 * n
        assert abs(X[k2]) > 0.45 * n
        mask = np.ones(n, bool)
        mask[[k1, k2]] = False
        assert np.max(np.abs(X[mask])) < 0.01 * n
