"""Pipeline-parallel streaming pipeline (dist/pp_pipeline.py):
sharded == unsharded for every supported pipeline depth, window
handling, validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fftlab.algos.split_stockham import spectral_filter_split
from fftlab.dist.pp_pipeline import pp_spectral_pipeline_split


def _reference(blocks_r, blocks_i, hr, hi, w):
    return spectral_filter_split(
        jnp.asarray(blocks_r) * w, jnp.asarray(blocks_i) * w,
        jnp.asarray(hr), jnp.asarray(hi),
    )


@pytest.fixture(scope="module")
def data():
    B, n = 6, 256
    rng = np.random.default_rng(17)
    return (
        rng.standard_normal((B, n)).astype(np.float32),
        rng.standard_normal((B, n)).astype(np.float32),
        rng.standard_normal(n).astype(np.float32),   # H real part
        rng.standard_normal(n).astype(np.float32),   # H imag part
        rng.standard_normal(n).astype(np.float32),   # window
    )


class TestPpPipeline:
    @pytest.mark.parametrize("p", [1, 2, 4])
    def test_matches_unsharded_every_depth(self, data, p):
        br, bi, hr, hi, w = data
        mesh = jax.make_mesh((p,), ("pp",))
        yr, yi = pp_spectral_pipeline_split(br, bi, hr, hi, mesh,
                                            axis_name="pp", window=w)
        want_r, want_i = _reference(br, bi, hr, hi, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(yr), np.asarray(want_r),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(want_i),
                                   atol=1e-3)

    def test_default_window_is_identity(self, data):
        br, bi, hr, hi, _ = data
        mesh = jax.make_mesh((4,), ("pp",))
        yr, yi = pp_spectral_pipeline_split(br, bi, hr, hi, mesh)
        ones = jnp.ones(br.shape[-1], jnp.float32)
        want_r, want_i = _reference(br, bi, hr, hi, ones)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(want_r),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(want_i),
                                   atol=1e-3)

    def test_single_block_fill_drain(self, data):
        """B < P: the pipeline is pure fill/drain bubbles and must still
        produce the right (single) block."""
        br, bi, hr, hi, w = data
        mesh = jax.make_mesh((4,), ("pp",))
        yr, yi = pp_spectral_pipeline_split(br[:1], bi[:1], hr, hi, mesh,
                                            window=w)
        want_r, want_i = _reference(br[:1], bi[:1], hr, hi, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(yr), np.asarray(want_r),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(want_i),
                                   atol=1e-3)

    def test_validation(self, data):
        br, bi, hr, hi, w = data
        mesh3 = jax.make_mesh((3,), ("pp",))
        with pytest.raises(ValueError, match="divide"):
            pp_spectral_pipeline_split(br, bi, hr, hi, mesh3)
        mesh = jax.make_mesh((4,), ("pp",))
        with pytest.raises(ValueError, match="blocks"):
            pp_spectral_pipeline_split(br[0], bi[0], hr, hi, mesh)
        with pytest.raises(ValueError, match="window"):
            pp_spectral_pipeline_split(br, bi, hr, hi, mesh,
                                       window=w[:-1])
        with pytest.raises(ValueError, match="response"):
            pp_spectral_pipeline_split(br, bi, hr[:-1], hi[:-1], mesh)
