"""Native C++ runtime component tests (WAV IO, ring buffer, Q15 FFT).

Skipped wholesale if no C++ toolchain is available in the environment.
"""

import numpy as np
import pytest

pytest.importorskip("fftlab.native.lib")
from fftlab.native.lib import native_available

if not native_available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from fftlab.native.q15 import (
    float_to_q15,
    q15_fft,
    q15_fft_float,
    q15_normalize,
    q15_to_float,
)
from fftlab.native.ring import RingBuffer
from fftlab.native.wav import read_wav, wav_info, write_wav


class TestWav:
    def test_roundtrip_mono(self, tmp_path):
        fs = 8000
        t = np.arange(4000) / fs
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = str(tmp_path / "tone.wav")
        write_wav(p, x, fs)
        info = wav_info(p)
        assert info == {"sample_rate": fs, "channels": 1,
                        "frames": 4000, "bits": 16}
        y, fs2 = read_wav(p)
        assert fs2 == fs
        np.testing.assert_allclose(y, x, atol=1.0 / 32000)

    def test_roundtrip_stereo(self, tmp_path):
        rng = np.random.default_rng(0)
        x = (0.8 * rng.standard_normal((1000, 2))).clip(-1, 1).astype(np.float32)
        p = str(tmp_path / "st.wav")
        write_wav(p, x, 44100)
        y, fs = read_wav(p)
        assert y.shape == (1000, 2) and fs == 44100
        # write scales by 32767, read divides by 32768: ~1.5 LSB worst case
        np.testing.assert_allclose(y, x, atol=1.5 / 32768)

    def test_clipping_saturates(self, tmp_path):
        p = str(tmp_path / "clip.wav")
        write_wav(p, np.array([2.0, -2.0], dtype=np.float32), 8000)
        y, _ = read_wav(p)
        assert abs(y[0] - 1.0) < 2e-3 and abs(y[1] + 1.0) < 2e-3

    def test_missing_file_raises(self):
        with pytest.raises(OSError):
            wav_info("/nonexistent/nope.wav")

    def test_garbage_file_raises(self, tmp_path):
        p = str(tmp_path / "bad.wav")
        open(p, "wb").write(b"not a wav file at all")
        with pytest.raises(OSError):
            read_wav(p)


class TestRingBuffer:
    def test_capacity_rounds_to_pow2(self):
        rb = RingBuffer(1000)
        assert rb.capacity == 1024

    def test_write_read_fifo(self):
        rb = RingBuffer(64)
        assert rb.write(np.arange(10, dtype=np.float32)) == 10
        assert rb.available == 10
        got = rb.read(10)
        np.testing.assert_array_equal(got, np.arange(10, dtype=np.float32))
        assert rb.available == 0

    def test_wraparound(self):
        rb = RingBuffer(16)
        for start in range(0, 100, 10):
            rb.write(np.arange(start, start + 10, dtype=np.float32))
            got = rb.read(10)
            np.testing.assert_array_equal(
                got, np.arange(start, start + 10, dtype=np.float32)
            )

    def test_overfill_truncates(self):
        rb = RingBuffer(16)
        wrote = rb.write(np.zeros(100, dtype=np.float32))
        assert wrote == 16 and rb.space == 0

    def test_peek_hop_overlap(self):
        rb = RingBuffer(2048)
        rb.write(np.arange(600, dtype=np.float32))
        f1 = rb.peek_hop(512, 128)
        assert f1 is not None and f1[0] == 0
        assert rb.peek_hop(512, 128) is None  # starved (only 472 left)
        rb.write(np.arange(600, 700, dtype=np.float32))
        f2 = rb.peek_hop(512, 128)
        np.testing.assert_array_equal(f1[128:], f2[:384])  # 75% overlap

    def test_use_after_close_raises(self):
        """A closed handle must raise, not hand the C side a NULL to
        dereference (regression: hard SIGSEGV)."""
        import pytest as _pytest

        rb = RingBuffer(256)
        rb.close()
        for op in (lambda: rb.available, lambda: rb.capacity,
                   lambda: rb.space, lambda: rb.write(np.zeros(4, np.float32)),
                   lambda: rb.read(4), lambda: rb.peek_hop(4, 2)):
            with _pytest.raises(ValueError, match="closed"):
                op()
        rb.close()  # double close is fine


class TestQ15:
    def test_float_q15_roundtrip(self):
        x = np.array([0.0, 0.5, -0.5, 0.999])
        np.testing.assert_allclose(q15_to_float(float_to_q15(x)), x,
                                   atol=1.0 / 32768)

    def test_saturation(self):
        assert float_to_q15(np.array([2.0]))[0] == 32767
        assert float_to_q15(np.array([-2.0]))[0] == -32768

    def test_full_scale_no_wrap(self):
        """Full-scale alternating input: the butterfly's twiddle-product
        sum exceeds int16 and must SATURATE, not wrap (regression: a
        bare int16 cast wrapped 46339 to -19197, corrupting the
        spectrum of the fixed-point oracle)."""
        n = 8
        x = np.full(n, 32767, np.int16)
        x[1::2] = -32767
        r, i, sh = q15_fft(x.copy(), x.copy())
        got = (q15_to_float(r) + 1j * q15_to_float(i)) * (1 << sh)
        want = np.fft.fft((x / 32768.0) + 1j * (x / 32768.0))
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_fft_impulse(self):
        re = np.zeros(64, np.int16)
        re[0] = 16384  # 0.5 in Q15
        im = np.zeros(64, np.int16)
        r, i, exp = q15_fft(re, im)
        assert exp == 6
        # Impulse -> flat spectrum: 0.5/64 per bin before exponent.
        np.testing.assert_allclose(q15_to_float(r), 0.5 / 64, atol=2e-3)
        np.testing.assert_allclose(q15_to_float(i), 0.0, atol=2e-3)

    @pytest.mark.parametrize("n", [64, 256, 1024])
    def test_fft_matches_float_oracle(self, n):
        rng = np.random.default_rng(n)
        z = 0.3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        X = q15_fft_float(z)
        want = np.fft.fft(z)
        snr = 10 * np.log10(
            np.sum(np.abs(want) ** 2) / np.sum(np.abs(X - want) ** 2)
        )
        # Q15 with per-stage block scaling: ~5-6 bits of headroom noise.
        assert snr > 25.0, f"Q15 SNR {snr:.1f} dB at n={n}"

    def test_invalid_size_raises(self):
        with pytest.raises(ValueError):
            q15_fft(np.zeros(100, np.int16), np.zeros(100, np.int16))

    def test_normalize(self):
        re = np.full(8, 100, np.int16)
        im = np.zeros(8, np.int16)
        r, i, shifts = q15_normalize(re, im)
        assert shifts == 8  # 100 << 8 = 25600 <= 32767
        assert r[0] == 100 << 8

    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(5)
        z = 0.4 * (rng.standard_normal(256) + 1j * rng.standard_normal(256))
        X = q15_fft_float(z)
        s = np.abs(X).max() / 0.9
        back = q15_fft_float(X / s, inverse=True) * s
        snr = 10 * np.log10(
            np.sum(np.abs(z) ** 2) / np.sum(np.abs(back - z) ** 2)
        )
        assert snr > 25.0
