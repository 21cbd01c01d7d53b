"""Plan-layer validation and API-robustness tests (the typed-error
analog of the reference's exit-on-fail macros, fft_common.h:117-127)."""

import numpy as np
import pytest

import fftlab
from fftlab.plan.api import plan_dft_1d, plan_dft_2d, plan_r2c_1d
from fftlab.plan.flags import Flags, PlanConfig
from fftlab.plan.planner import estimate_algorithm, measure_algorithm


class TestPlanValidation:
    def test_unknown_algorithm_raises(self):
        with pytest.raises(KeyError):
            fftlab.fft(np.zeros(64, np.complex64), algorithm="warp_drive")

    def test_pow2_only_algorithm_on_composite_raises(self):
        with pytest.raises(Exception):
            np.asarray(fftlab.fft(np.zeros(100, np.complex64),
                                  algorithm="radix2_dit"))

    def test_plan_reuse_is_cached(self):
        p1 = plan_dft_1d(2048)
        p2 = plan_dft_1d(2048)
        assert p1 is p2  # lru-cached plan identity = FFTW plan reuse

    def test_plan_describe(self):
        p = plan_dft_1d(512)
        assert "512" in p.describe() and "FORWARD" in p.describe()
        p.destroy()  # no-op, must not break the cached plan
        assert np.asarray(p.execute(np.ones(512, np.complex64))).shape == (512,)

    def test_r2c_plan_shapes(self):
        p = plan_r2c_1d(256)
        out = np.asarray(p.execute(np.ones(256, np.float32)))
        assert out.shape == (129,)

    def test_2d_plan(self):
        p = plan_dft_2d(16, 32)
        out = np.asarray(p.execute(np.ones((16, 32), np.complex64)))
        assert out.shape == (16, 32)
        assert abs(out[0, 0] - 512) < 1e-3

    def test_measure_mode_records_wisdom(self):
        from fftlab.plan import wisdom

        wisdom.forget()
        name = measure_algorithm(
            128, fftlab.FORWARD, np.complex64, Flags.MEASURE, PlanConfig(),
            batch=2, iters=2,
        )
        assert wisdom.lookup(128, "f32") is not None
        assert wisdom.lookup(128, "f32")["algorithm"] == name
        wisdom.forget()

    def test_wisdom_only_without_wisdom_raises(self):
        from fftlab.plan import wisdom

        wisdom.forget()
        with pytest.raises(RuntimeError):
            measure_algorithm(
                4096, fftlab.FORWARD, np.complex64, Flags.WISDOM_ONLY,
                PlanConfig(),
            )

    def test_estimate_prefers_flagship(self):
        assert estimate_algorithm(4096, PlanConfig()) == "stockham_mxu"
        assert estimate_algorithm(100003, PlanConfig()) == "bluestein"


class TestSplitTuning:
    def test_tune_and_recall(self):
        from fftlab.plan import wisdom
        from fftlab.plan.split_tuning import best_leaf, tune_split_leaf

        wisdom.forget()
        leaf = tune_split_leaf(4096, leaves=(64, 128), batch=1, iters=2)
        assert leaf in (64, 128)
        assert best_leaf(4096) == leaf
        wisdom.forget()
        from fftlab.algos.split_stockham import DEFAULT_LEAF_SPLIT

        assert best_leaf(4096) == DEFAULT_LEAF_SPLIT

    def test_prime_unreachable_leaves_fall_back(self):
        from fftlab.plan.split_tuning import tune_split_leaf
        from fftlab.algos.split_stockham import DEFAULT_LEAF_SPLIT

        # 10007 is prime > all leaves: nothing measurable.
        assert tune_split_leaf(10007, leaves=(64, 128),
                               persist=False) == DEFAULT_LEAF_SPLIT


class TestEdgeSizes:
    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_tiny_transforms(self, n):
        x = np.arange(1, n + 1, dtype=np.complex128)
        got = np.asarray(fftlab.fft(x))
        np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-12)

    def test_n1_split(self):
        from fftlab.algos.split_stockham import fft_split

        yr, yi = fft_split(np.ones(1), np.zeros(1))
        assert float(yr[0]) == 1.0

    def test_registry_four_step(self):
        from fftlab.algos import build_registry

        reg = build_registry()
        assert reg["four_step"].supports(100)
        assert not reg["four_step"].supports(97)  # prime
        x = np.random.default_rng(0).standard_normal(144) * (1 + 0j)
        got = np.asarray(reg["four_step"].fn(x))
        np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-9)
