"""Gather-free TP spectral filter (dist/tp_pipeline.py): the VERDICT-r1
composition test — four_step(flatten=False) -> sharded pointwise ->
inverse with no replication gather, vs the unsharded reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fftlab.algos.split_stockham import spectral_filter_split
from fftlab.dist.tp_pipeline import tp_spectral_filter_split


@pytest.fixture(scope="module")
def mesh8():
    devs = np.asarray(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs.reshape(8), ("tp",))


def _mk(n, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal(n), jnp.float32),
            jnp.asarray(rng.standard_normal(n), jnp.float32))


def _mk_h(n, seed=1):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal(n), jnp.float32),
            jnp.asarray(rng.standard_normal(n), jnp.float32))


class TestTpSpectralFilter:
    def test_matches_unsharded(self, mesh8):
        n = 1 << 16
        xr, xi = _mk(n)
        hr, hi = _mk_h(n)
        yr, yi = tp_spectral_filter_split(xr, xi, hr, hi, mesh8,
                                          flatten=True)
        wr, wi = spectral_filter_split(xr, xi, hr, hi)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(wr),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(wi),
                                   atol=2e-2)

    def test_identity_response_roundtrip(self, mesh8):
        n = 1 << 14
        xr, xi = _mk(n, 3)
        ones = jnp.ones(n, jnp.float32)
        zeros = jnp.zeros(n, jnp.float32)
        yr, yi = tp_spectral_filter_split(xr, xi, ones, zeros, mesh8,
                                          flatten=True)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(xr),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(xi),
                                   atol=5e-3)

    def test_output_sharding_matches_input_spec(self, mesh8):
        # the gather-free contract: matrix output stays sharded over the
        # mesh axis on its LAST dim — same spec as the input matrix —
        # so stages chain without re-sharding.
        n = 1 << 14
        xr, xi = _mk(n, 4)
        hr, hi = _mk_h(n, 5)
        yr, yi = tp_spectral_filter_split(xr, xi, hr, hi, mesh8)
        assert yr.shape == (128, 128)
        spec = yr.sharding.spec
        assert tuple(spec) == (None, "tp")
        # and NO device holds the full array (i.e. it really is sharded)
        assert yr.addressable_shards[0].data.shape == (128, 16)

    def test_chained_filters_compose(self, mesh8):
        # run the pipeline twice back-to-back (matrix in, matrix out):
        # equals applying H twice in one unsharded filter.
        n = 1 << 14
        xr, xi = _mk(n, 6)
        hr, hi = _mk_h(n, 7)
        m1r, m1i = tp_spectral_filter_split(xr, xi, hr, hi, mesh8)
        # feed the sharded matrix straight back in (flatten is a view
        # change only at the API level; reuse flat for simplicity here
        # by reshaping the matrix pair — no gather happens under jit
        # because shardings already match the input spec)
        n1, n2 = 128, 128
        m1r_flat = m1r.reshape(n)
        m1i_flat = m1i.reshape(n)
        y2r, y2i = tp_spectral_filter_split(m1r_flat, m1i_flat, hr, hi,
                                            mesh8, flatten=True)
        h2r = hr * hr - hi * hi
        h2i = 2 * hr * hi
        wr, wi = spectral_filter_split(xr, xi, h2r, h2i)
        np.testing.assert_allclose(np.asarray(y2r), np.asarray(wr),
                                   rtol=0, atol=5e-2)
        np.testing.assert_allclose(np.asarray(y2i), np.asarray(wi),
                                   rtol=0, atol=5e-2)

    def test_16m_matches_unsharded(self, mesh8):
        # the VERDICT "done" bar: 16M-point sharded spectral filter ==
        # unsharded result. Ideal low-pass H (0/1 mask) keeps the
        # comparison numerically clean at f32.
        n = 1 << 24
        rng = np.random.default_rng(9)
        xr = jnp.asarray(rng.standard_normal(n), jnp.float32)
        xi = jnp.zeros(n, jnp.float32)
        mask = np.zeros(n, np.float32)
        mask[: n // 64] = 1.0
        mask[-(n // 64) + 1:] = 1.0
        hr = jnp.asarray(mask)
        hi = jnp.zeros(n, jnp.float32)
        yr, yi = tp_spectral_filter_split(xr, xi, hr, hi, mesh8,
                                          flatten=True)
        wr, wi = spectral_filter_split(xr, xi, hr, hi)
        err = float(jnp.max(jnp.abs(yr - wr)))
        scale = float(jnp.max(jnp.abs(wr))) + 1e-9
        assert err / scale < 1e-3, (err, scale)

    def test_indivisible_mesh_raises(self, mesh8):
        with pytest.raises(ValueError):
            tp_spectral_filter_split(
                jnp.zeros(12 * 12, jnp.float32),
                jnp.zeros(12 * 12, jnp.float32),
                jnp.ones(144, jnp.float32), jnp.zeros(144, jnp.float32),
                mesh8,
            )
