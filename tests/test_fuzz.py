"""Hypothesis fuzz tests over the core invariants: framing geometry,
window properties, transform linearity/roundtrip at random sizes."""

import numpy as np
from hypothesis import given, settings, strategies as st

from fftlab.core.framing import frame_signal_strided, frames_needed
from fftlab.core.types import (
    is_power_of_two,
    log2_int,
    next_power_of_two,
)
from fftlab.core.window import get_window

SETTINGS = dict(max_examples=40, deadline=None)


class TestIntHelpers:
    @given(st.integers(min_value=1, max_value=1 << 30))
    @settings(**SETTINGS)
    def test_next_power_of_two(self, n):
        p = next_power_of_two(n)
        assert is_power_of_two(p) and p >= n and p < 2 * n or n == 1

    @given(st.integers(min_value=0, max_value=29))
    @settings(**SETTINGS)
    def test_log2_roundtrip(self, e):
        assert log2_int(1 << e) == e


class TestFramingFuzz:
    @given(
        frame=st.integers(min_value=2, max_value=300),
        hop=st.integers(min_value=1, max_value=300),
        n_frames=st.integers(min_value=1, max_value=12),
        extra=st.integers(min_value=0, max_value=50),
    )
    @settings(**SETTINGS)
    def test_frames_match_bruteforce(self, frame, hop, n_frames, extra):
        need = (n_frames - 1) * hop + frame
        rng = np.random.default_rng(frame * 31 + hop)
        x = rng.standard_normal(need + extra).astype(np.float32)
        got = np.asarray(frame_signal_strided(x, frame, hop, n_frames))
        assert got.shape == (n_frames, frame)
        for k in range(n_frames):
            np.testing.assert_array_equal(got[k], x[k * hop : k * hop + frame])

    @given(
        total=st.integers(min_value=8, max_value=5000),
        frame=st.integers(min_value=2, max_value=256),
        hop=st.integers(min_value=1, max_value=256),
    )
    @settings(**SETTINGS)
    def test_frames_needed_covers(self, total, frame, hop):
        if frame > total:
            return
        k = frames_needed(total, frame, hop)
        assert (k - 1) * hop + frame <= total + hop  # no overshoot beyond one hop
        assert k * hop + frame > total or (k - 1) * hop + frame >= total


class TestWindowFuzz:
    @given(
        name=st.sampled_from(["hann", "hamming", "blackman", "kaiser",
                              "tukey", "rectangular"]),
        n=st.integers(min_value=2, max_value=4096),
    )
    @settings(**SETTINGS)
    def test_window_bounds(self, name, n):
        w = get_window(name, n)
        assert w.shape == (n,)
        assert np.all(w <= 1.0 + 1e-12) and np.all(w >= -1e-12)
        assert np.all(np.isfinite(w))


class TestTransformFuzz:
    @given(n=st.integers(min_value=2, max_value=600))
    @settings(max_examples=25, deadline=None)
    def test_fft_matches_numpy_any_size(self, n):
        import fftlab

        rng = np.random.default_rng(n)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        got = np.asarray(fftlab.fft(x))
        np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-8 * max(n, 8))

    @given(
        n=st.integers(min_value=2, max_value=300),
        a=st.floats(min_value=-3, max_value=3),
        b=st.floats(min_value=-3, max_value=3),
    )
    @settings(max_examples=25, deadline=None)
    def test_linearity_any_size(self, n, a, b):
        import fftlab

        rng = np.random.default_rng(n)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        y = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        lhs = np.asarray(fftlab.fft(a * x + b * y))
        rhs = a * np.asarray(fftlab.fft(x)) + b * np.asarray(fftlab.fft(y))
        np.testing.assert_allclose(lhs, rhs, atol=1e-7 * max(n, 8))

    @given(n=st.integers(min_value=4, max_value=400))
    @settings(max_examples=20, deadline=None)
    def test_rfft_split_any_even_size(self, n):
        from fftlab.algos.split_stockham import from_split, rfft_split

        n = n * 2  # even
        rng = np.random.default_rng(n)
        x = rng.standard_normal(n)
        got = from_split(*rfft_split(x))
        np.testing.assert_allclose(got, np.fft.rfft(x), atol=1e-8)
