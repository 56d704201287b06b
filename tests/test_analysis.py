"""Fitting tests (cf. reference ``analysis.py:2690`` test_analysis): Asimov
recovery of injected truth with gradient and derivative-free minimizers,
octant strategy, and profile scans."""

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.analysis.analysis import Analysis, BasicAnalysis, HypoFitResult
from pisa_tpu.core.distribution_maker import DistributionMaker
from pisa_tpu.core.pipeline import Pipeline


@pytest.fixture(scope="module")
def hypo_maker():
    return DistributionMaker(
        ["settings/pipeline/toy_fit_example.cfg"], label="toy"
    )


@pytest.fixture(scope="module")
def truth():
    return dict(theta23=42.0, delta_index=0.0)


@pytest.fixture(scope="module")
def asimov_data(hypo_maker, truth):
    hypo_maker.params["theta23"].value = truth["theta23"] * ureg.degree
    hypo_maker.params["delta_index"].value = truth["delta_index"]
    data = hypo_maker.get_outputs(return_sum=True)
    hypo_maker.reset_free()
    return data


class TestGradientFit:
    def test_recover_truth(self, hypo_maker, asimov_data, truth):
        ana = BasicAnalysis()
        # start away from truth
        hypo_maker.params["theta23"].value = 38.0 * ureg.degree
        hypo_maker.params["delta_index"].value = 0.05
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "gradient", {}, None
        )
        assert isinstance(result, HypoFitResult)
        assert result.metric_val < 1e-4
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5, fit_t23
        assert (
            abs(result.params["delta_index"].value.magnitude) < 0.01
        )
        # hypo maker left at best fit
        assert (
            abs(hypo_maker.params["theta23"].value.m_as("degree") - truth["theta23"])
            < 0.5
        )

    def test_gradient_uses_few_evaluations(self, hypo_maker, asimov_data):
        ana = BasicAnalysis()
        hypo_maker.params["theta23"].value = 40.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "gradient", {}, None
        )
        # analytic gradients: ~10-30 value+grad evals, not 2N+1 per step
        assert result.minimizer_metadata["nfev"] < 100

    def test_llh_metric(self, hypo_maker, asimov_data, truth):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 44.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "llh", None, "gradient", {}, None
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5


class TestDerivativeFreeFit:
    def test_nelder_mead(self, hypo_maker, asimov_data, truth):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 40.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "chi2", None, "scipy",
            {"method": "nelder-mead", "options": {"xatol": 1e-5, "fatol": 1e-9}},
            None,
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 1.0, fit_t23


class TestOctants:
    def test_octant_recovery_from_wrong_octant(
        self, hypo_maker, asimov_data, truth
    ):
        """Truth at 42 deg (first octant); start in second octant."""
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 50.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None,
            "octants",
            {"angle": "theta23", "inflection_point": 45 * ureg.degree},
            {"method": "gradient", "method_kwargs": {}},
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5, fit_t23
        # range restored after octant fit
        lo, hi = result.params["theta23"].range
        assert lo.m_as("degree") == 0.0 and hi.m_as("degree") == 90.0


class TestStrategies:
    def test_best_of(self, hypo_maker, asimov_data, truth):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "best_of", {},
            [
                {"method": "gradient", "method_kwargs": {}},
                {"method": "scipy", "method_kwargs": {"method": "nelder-mead"}},
            ],
        )
        assert result.metric_val < 1e-3

    def test_grid_scan_no_inner_fit(self, hypo_maker, asimov_data, truth):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        values = [40.0 * ureg.deg, 42.0 * ureg.deg, 44.0 * ureg.deg]
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "chi2", None, "grid_scan",
            {"grid": {"theta23": values}}, None,
        )
        # best grid point should be the truth
        assert np.isclose(
            result.params["theta23"].value.m_as("degree"), 42.0
        )
        assert len(result.grid_scan_results) == 3

    def test_profile_scan(self, hypo_maker, asimov_data):
        ana = Analysis()
        hypo_maker.reset_free()
        results = ana.profile(
            asimov_data,
            hypo_maker,
            "theta23",
            [40 * ureg.deg, 42 * ureg.deg, 44 * ureg.deg],
            "mod_chi2",
            method="gradient",
        )
        vals = [r.metric_val for r in results]
        # parabola with minimum at truth (middle point)
        assert vals[1] < vals[0] and vals[1] < vals[2]


class TestFitResult:
    def test_state_roundtrip(self, hypo_maker, asimov_data):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "gradient", {}, None
        )
        state = result.state
        assert "metric_val" in state
        assert state["num_distributions_generated"] >= 1
        assert result.hypo_asimov_dist is not None
        assert result.minimizer_time.m_as("s") > 0
