"""All framing strategies must produce identical frames."""


import numpy as np
import pytest

from fftlab.core.framing import (
    _frames_gather,
    _frames_patches,
    _frames_slices,
    _pad_to,
    frame_signal_strided,
    frames_needed,
)


@pytest.mark.parametrize("frame,hop,n_frames", [
    (4096, 3968, 5),   # overlap-save (small overlap)
    (512, 128, 12),    # STFT 75% overlap
    (256, 256, 4),     # disjoint
    (100, 37, 9),      # awkward sizes
])
def test_strategies_agree(frame, hop, n_frames):
    rng = np.random.default_rng(frame + hop)
    x = rng.standard_normal((2, (n_frames - 1) * hop + frame + 13)).astype(
        np.float32)
    import jax.numpy as jnp

    xp = _pad_to(jnp.asarray(x), (n_frames - 1) * hop + frame)
    a = np.asarray(_frames_gather(xp, frame, hop, n_frames))
    b = np.asarray(_frames_patches(xp, frame, hop, n_frames))
    c = np.asarray(_frames_slices(jnp.asarray(x), frame, hop, n_frames))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
    # And the dispatcher matches.
    d = np.asarray(frame_signal_strided(x, frame, hop, n_frames))
    np.testing.assert_array_equal(a, d)


def test_short_input_zero_extended():
    got = np.asarray(frame_signal_strided(np.ones(10, np.float32), 8, 4, 3))
    assert got.shape == (3, 8)
    np.testing.assert_array_equal(got[2][2:], 0)  # tail zero-padded


def test_env_override(monkeypatch):
    monkeypatch.setenv("FFTLAB_FRAMING", "slices")
    x = np.arange(32, dtype=np.float32)
    got = np.asarray(frame_signal_strided(x, 8, 4, 5))
    np.testing.assert_array_equal(got[1], x[4:12])


def test_validation():
    with pytest.raises(ValueError):
        frame_signal_strided(np.ones(8), 0, 4, 1)
    assert frames_needed(100, 20, 10) == 9
