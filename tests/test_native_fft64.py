"""Host-native float64 FFT backend (native/fft64.cpp): three-way oracle
cross-check (native C++ vs numpy pocketfft vs the JAX registry),
inverse scaling, batching, plan-layer row, and argument gates."""

import numpy as np
import pytest

from fftlab.native.lib import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _snr(got, want):
    return 10 * np.log10(
        np.sum(np.abs(want) ** 2)
        / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )


class TestNativeFFT64:
    @pytest.mark.parametrize("n", [1, 2, 8, 64, 256, 4096])
    def test_matches_numpy(self, n):
        from fftlab.native.fft64 import fft64

        rng = np.random.default_rng(n % 13)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        got = fft64(x)
        want = np.fft.fft(x)
        # float64 vs float64: near machine precision
        assert _snr(got, want) > 250.0

    def test_matches_jax_registry(self):
        """Independent of BOTH numpy and the C++ code: the JAX radix-2
        algorithm agrees with the native backend (three codebases, one
        transform)."""
        import jax.numpy as jnp

        from fftlab.algos.radix2 import fft_radix2_dit
        from fftlab.native.fft64 import fft64

        n = 512
        rng = np.random.default_rng(7)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        got = fft64(x)
        reg = np.asarray(fft_radix2_dit(jnp.asarray(x, jnp.complex128)))
        assert _snr(got, reg) > 250.0

    def test_inverse_roundtrip_and_scaling(self):
        from fftlab.native.fft64 import fft64

        n = 1024
        rng = np.random.default_rng(3)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        y = fft64(x)
        back = fft64(y, inverse=True)  # 1/n scaled
        np.testing.assert_allclose(back, x, atol=1e-12)

    def test_batched_rows_independent(self):
        from fftlab.native.fft64 import fft64

        rng = np.random.default_rng(5)
        x = rng.standard_normal((3, 2, 128)) + 1j * rng.standard_normal(
            (3, 2, 128))
        got = fft64(x)
        assert got.shape == x.shape
        want = np.fft.fft(x, axis=-1)
        assert _snr(got, want) > 250.0

    def test_split_planes_and_input_untouched(self):
        from fftlab.native.fft64 import fft64_split

        n = 256
        rng = np.random.default_rng(9)
        re = rng.standard_normal((2, n))
        im = rng.standard_normal((2, n))
        re0, im0 = re.copy(), im.copy()
        yr, yi = fft64_split(re, im)
        np.testing.assert_array_equal(re, re0)  # copies, not in-place
        np.testing.assert_array_equal(im, im0)
        want = np.fft.fft(re + 1j * im, axis=-1)
        assert _snr(yr + 1j * yi, want) > 250.0

    def test_non_pow2_rejected(self):
        from fftlab.native.fft64 import fft64

        with pytest.raises(ValueError):
            fft64(np.zeros(12, np.complex128))

    def test_shape_mismatch_rejected(self):
        from fftlab.native.fft64 import fft64_split

        with pytest.raises(ValueError):
            fft64_split(np.zeros((2, 8)), np.zeros((3, 8)))


class TestNativePlanRow:
    def test_plan_executes_native(self):
        from fftlab.plan.api import plan_dft_1d_native

        n = 256
        plan = plan_dft_1d_native(n)
        assert plan.algorithm == "native_fft64"
        rng = np.random.default_rng(11)
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        got = plan.execute(x)
        assert isinstance(got, np.ndarray)  # host arrays, no device
        assert _snr(got, np.fft.fft(x, axis=-1)) > 250.0

    def test_plan_direction_honored(self):
        """The reference's GPU execute ignores the plan's direction
        (fft_gpu.c:252,258); the native row must not."""
        from fftlab.core.types import INVERSE
        from fftlab.plan.api import plan_dft_1d_native

        n = 64
        rng = np.random.default_rng(13)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        fwd = plan_dft_1d_native(n)
        inv = plan_dft_1d_native(n, INVERSE)
        np.testing.assert_allclose(inv.execute(fwd.execute(x)), x,
                                   atol=1e-12)

    def test_plan_gates(self):
        from fftlab.plan.api import plan_dft_1d_native

        with pytest.raises(ValueError):
            plan_dft_1d_native(100)  # non-pow2
        plan = plan_dft_1d_native(32)
        with pytest.raises(ValueError):
            plan.execute(np.zeros(64, np.complex128))  # wrong length
