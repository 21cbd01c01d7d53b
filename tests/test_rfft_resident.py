"""Fused one-residency r2c kernel (kernels/rfft_resident) — interpret
mode. Covers the window floor/ceiling, the multi-block mirror path
(G1 > 1 with straggler wrap columns), scale folding, batch shapes, and
the Nyquist tail-pad layout. Reference anchor: the r2c plan the
reference never shipped (fft_auto.c:391-403)."""

import numpy as np
import pytest

from fftlab.kernels.rfft_resident import (
    rfft_resident,
    supported_rfft_resident,
)


def _snr_db(got, want):
    err = np.sum(np.abs(got - want) ** 2)
    sig = np.sum(np.abs(want) ** 2)
    return float(10 * np.log10(sig / max(err, 1e-300)))


def _check(x, scale=None, min_snr=110.0):
    yr, yi = rfft_resident(x, scale=scale, interpret=True)
    want = np.fft.rfft(np.asarray(x, np.float64), axis=-1)
    if scale is not None:
        want = want * scale
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    assert got.shape == want.shape
    assert _snr_db(got, want) > min_snr


@pytest.mark.parametrize("n", [1 << 16, 1 << 17, 1 << 18])
def test_rfft_resident_matches_numpy(n):
    rng = np.random.default_rng(n)
    _check(rng.standard_normal((2, n)).astype(np.float32))


def test_rfft_resident_multiblock_mirror():
    # n = 2^19 -> m = 2^18, L1 = 512, G1 = 4: the phase-C mirror spans
    # multiple scratch slots incl. the wrap straggler column.
    rng = np.random.default_rng(7)
    _check(rng.standard_normal((1, 1 << 19)).astype(np.float32))


def test_rfft_resident_scale_folding():
    rng = np.random.default_rng(3)
    _check(rng.standard_normal((2, 1 << 16)).astype(np.float32),
           scale=0.25)


def test_rfft_resident_batch_shapes():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 1 << 16)).astype(np.float32)
    yr, yi = rfft_resident(x, interpret=True)
    assert yr.shape == (2, 3, (1 << 15) + 1)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    assert _snr_db(got, want) > 110.0


def test_rfft_resident_dc_and_nyquist_real():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 1 << 16)).astype(np.float32)
    yr, yi = rfft_resident(x, interpret=True)
    assert abs(float(yi[0, 0])) < 1e-3          # DC imag = 0
    assert abs(float(yi[0, -1])) < 1e-3         # Nyquist imag = 0
    want = np.fft.rfft(np.asarray(x[0], np.float64))
    np.testing.assert_allclose(float(yr[0, -1]), want[-1].real,
                               rtol=1e-4, atol=1e-2)


def test_supported_window():
    assert supported_rfft_resident(1 << 16)
    assert supported_rfft_resident(1 << 21)
    assert not supported_rfft_resident(1 << 22)   # m = 2^21 > resident
    assert not supported_rfft_resident(1 << 15)   # m = 2^14 < resident
    assert not supported_rfft_resident((1 << 16) + 2)  # m not pow2


def test_unsupported_raises():
    with pytest.raises(ValueError):
        rfft_resident(np.zeros((1, 1000), np.float32), interpret=True)


@pytest.mark.parametrize("n", [1 << 16, 1 << 17])
def test_irfft_resident_matches_numpy(n):
    from fftlab.kernels.rfft_resident import irfft_resident

    rng = np.random.default_rng(n)
    x = rng.standard_normal((2, n))
    X = np.fft.rfft(x, axis=-1)
    y = irfft_resident(X.real.astype(np.float32),
                       X.imag.astype(np.float32), interpret=True)
    got = np.asarray(y, np.float64)
    assert got.shape == x.shape
    assert _snr_db(got, x) > 110.0


def test_irfft_resident_multiblock_and_scale():
    # G1 = 4 mirror-slot path + scale folding
    from fftlab.kernels.rfft_resident import irfft_resident

    rng = np.random.default_rng(13)
    n = 1 << 19
    x = rng.standard_normal((1, n))
    X = np.fft.rfft(x, axis=-1)
    y = irfft_resident(X.real.astype(np.float32),
                       X.imag.astype(np.float32), scale=2.0,
                       interpret=True)
    assert _snr_db(np.asarray(y, np.float64), 2.0 * x) > 110.0


def test_roundtrip_fused_pair():
    from fftlab.kernels.rfft_resident import irfft_resident

    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, 1 << 16)).astype(np.float32)
    yr, yi = rfft_resident(x, interpret=True)
    back = irfft_resident(yr, yi, interpret=True)
    assert _snr_db(np.asarray(back, np.float64),
                   np.asarray(x, np.float64)) > 110.0


def test_irfft_unsupported_raises():
    from fftlab.kernels.rfft_resident import irfft_resident

    with pytest.raises(ValueError):
        irfft_resident(np.zeros((1, 1000), np.float32),
                       np.zeros((1, 1000), np.float32), interpret=True)
