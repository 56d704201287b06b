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


class TestIminuitEquivalent:
    """Native Migrad+Hesse path (cf. reference ``analysis.py:1999``
    ``_fit_iminuit``): gradient minimization + inverse-Hessian errors."""

    def test_fit_and_hesse_errors(self, hypo_maker, asimov_data, truth):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 39.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "iminuit", {}, None
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5
        errs = result.minimizer_metadata["hesse_errors"]
        assert set(errs) == set(result.params.free.names)
        # Asimov chi2 curvature errors must be positive, finite, and small
        # relative to the parameter ranges
        for name, err in errs.items():
            assert np.isfinite(err) and err > 0, (name, err)
        # marginal sigma is within the parameter range scale
        assert errs["theta23"] < 45.0  # degrees (range is 90 wide)

    def test_hesse_error_matches_profile_curvature(
        self, hypo_maker, asimov_data, truth
    ):
        """The *conditional* sigma from the Hesse covariance (inverse of the
        covariance's inverse diagonal) must match the numeric 1-d curvature
        of the objective with the other params held at the minimum; the
        marginal (reported) sigma must be >= the conditional one."""
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "iminuit", {}, None
        )
        free_names = list(hypo_maker.params.free.names)
        i = free_names.index("theta23")
        cov = np.asarray(result.minimizer_metadata["hesse_cov_rescaled"])
        sigma_marg_r = np.sqrt(cov[i, i])
        sigma_cond_r = np.sqrt(1.0 / np.linalg.inv(cov)[i, i])
        assert sigma_marg_r >= sigma_cond_r * 0.999

        # numeric 1-d curvature at the minimum (mod_chi2: errordef 2)
        compiled = ana._get_compiled(hypo_maker)
        value_fn, _ = compiled.build_objective(asimov_data, "mod_chi2")
        x = np.asarray(hypo_maker.params.free._rescaled_values)
        h = 5e-3
        xp, xm = x.copy(), x.copy()
        xp[i] += h
        xm[i] -= h
        d2 = (
            float(value_fn(xp)) - 2 * float(value_fn(x)) + float(value_fn(xm))
        ) / h**2
        sigma_curv_r = np.sqrt(2.0 / d2)
        np.testing.assert_allclose(sigma_cond_r, sigma_curv_r, rtol=0.1)

        # reported physical error is the marginal sigma in physical units
        p = hypo_maker.params["theta23"]
        dmag = (p.range[1] - p.range[0]).m_as("degree")
        np.testing.assert_allclose(
            result.minimizer_metadata["hesse_errors"]["theta23"],
            sigma_marg_r * dmag, rtol=1e-6,
        )


class TestNloptEquivalent:
    """NLopt algorithm vocabulary via native scipy equivalents
    (cf. reference ``analysis.py:2218`` ``_fit_nlopt``)."""

    @pytest.mark.parametrize("algo", ["LN_NELDERMEAD", "LD_LBFGS"])
    def test_recovers_truth(self, hypo_maker, asimov_data, truth, algo):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 40.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
            {"algorithm": algo, "ftol_abs": 1e-9, "maxeval": 500}, None,
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5
        assert algo in result.minimizer_metadata["method"]

    def test_unknown_algorithm_raises(self, hypo_maker, asimov_data):
        ana = BasicAnalysis()
        with pytest.raises(ValueError):
            ana.fit_recursively(
                asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
                {"algorithm": "LN_BOGUS"}, None,
            )


try:
    import nlopt as _nlopt  # noqa: F401

    _HAVE_NLOPT = True
except ImportError:
    _HAVE_NLOPT = False


class TestNloptReal:
    """The real-nlopt fit path (cf. reference ``analysis.py:2218-2470``):
    derivative-free algorithms, stopping criteria, MLSL subsidiary local
    optimizers, inequality constraints. Runs against whichever backend
    ``analysis._import_nlopt`` resolves — the real nlopt package when
    installed, the in-repo scipy-backed shim
    (``pisa_tpu/utils/nlopt_shim.py``) otherwise — so the
    ``_fit_nlopt_real`` wiring executes in-suite either way."""

    @pytest.mark.parametrize("algo", ["LN_NELDERMEAD", "LN_SBPLX",
                                      "LN_COBYLA", "LN_BOBYQA"])
    def test_recovers_truth(self, hypo_maker, asimov_data, truth, algo):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 40.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
            {"algorithm": algo, "ftol_abs": 1e-9, "maxeval": 500}, None,
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5
        assert result.minimizer_metadata["method"].startswith("nlopt:")
        assert result.minimizer_metadata["nlopt_result"] > 0

    def test_mlsl_with_local_optimizer(self, hypo_maker, asimov_data):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 43.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
            {
                "algorithm": "G_MLSL_LDS",
                "maxeval": 60,
                "seed": 1,
                "local_optimizer": {
                    "algorithm": "LN_NELDERMEAD",
                    "ftol_abs": 1e-6,
                    "maxeval": 20,
                },
            },
            None,
        )
        assert np.isfinite(result.metric_val)

    def test_auglag_inequality_constraint(self, hypo_maker, asimov_data):
        """AUGLAG with a constraint keeping theta23 below 44 degrees: the
        unconstrained optimum (45 deg) must NOT be reached."""
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 40.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
            {
                "algorithm": "AUGLAG",
                "maxeval": 400,
                "ineq_constraints": [
                    "44.0 - params.theta23.value.m_as('degree')"
                ],
                "local_optimizer": {
                    "algorithm": "LN_COBYLA",
                    "ftol_abs": 1e-8,
                    "maxeval": 200,
                },
            },
            None,
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert fit_t23 <= 44.0 + 0.1

    def test_gradient_algorithms_rejected_to_native(
        self, hypo_maker, asimov_data, truth
    ):
        """LD_* names run the native analytic-gradient translation even
        with nlopt installed (the reference rejects them outright)."""
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 40.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
            {"algorithm": "LD_LBFGS", "ftol_abs": 1e-9, "maxeval": 500},
            None,
        )
        assert "nlopt-equivalent (native" in result.minimizer_metadata[
            "method"
        ]
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5


@pytest.mark.skipif(not _HAVE_NLOPT, reason="nlopt not installed")
class TestNloptRealPackage:
    """Real-package-only leg: proves the same schema against the actual
    nlopt C library when it is installed (kept per the reference's
    required-dependency policy, ``setup.py:86-115``)."""

    def test_recovers_truth_real_package(
        self, hypo_maker, asimov_data, truth, monkeypatch
    ):
        monkeypatch.delenv("PISA_TPU_NLOPT_SHIM", raising=False)
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 40.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
            {"algorithm": "LN_NELDERMEAD", "ftol_abs": 1e-9,
             "maxeval": 500}, None,
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 0.5


class TestNloptShimUnit:
    """Direct unit tests of the scipy-backed nlopt shim's API semantics
    (``pisa_tpu/utils/nlopt_shim.py``)."""

    def _rosen(self):
        calls = []

        def f(x, grad):
            assert grad.size == 0
            calls.append(np.asarray(x).copy())
            return float(
                (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2
            )

        return f, calls

    def test_neldermead_converges_and_reports(self):
        from pisa_tpu.utils import nlopt_shim as nl

        f, calls = self._rosen()
        opt = nl.opt(nl.LN_NELDERMEAD, 2)
        opt.set_min_objective(f)
        opt.set_lower_bounds(-2.0)
        opt.set_upper_bounds(2.0)
        opt.set_ftol_abs(1e-12)
        x = opt.optimize(np.array([-1.0, 1.5]))
        assert np.allclose(x, [1.0, 1.0], atol=1e-3)
        assert opt.last_optimize_result() > 0
        assert opt.get_numevals() == len(calls)
        assert opt.last_optimum_value() < 1e-6
        assert "LN_NELDERMEAD" in opt.get_algorithm_name()

    def test_maxeval_enforced(self):
        from pisa_tpu.utils import nlopt_shim as nl

        f, calls = self._rosen()
        opt = nl.opt(nl.LN_NELDERMEAD, 2)
        opt.set_min_objective(f)
        opt.set_lower_bounds(-2.0)
        opt.set_upper_bounds(2.0)
        opt.set_maxeval(17)
        opt.optimize(np.array([-1.0, 1.5]))
        assert len(calls) == 17
        assert opt.last_optimize_result() == nl.MAXEVAL_REACHED

    def test_stopval(self):
        from pisa_tpu.utils import nlopt_shim as nl

        f, _ = self._rosen()
        opt = nl.opt(nl.LN_NELDERMEAD, 2)
        opt.set_min_objective(f)
        opt.set_lower_bounds(-2.0)
        opt.set_upper_bounds(2.0)
        opt.set_stopval(1.0)
        opt.optimize(np.array([-1.0, 1.5]))
        assert opt.last_optimize_result() == nl.STOPVAL_REACHED
        assert opt.last_optimum_value() <= 1.0

    def test_constraints_rejected_on_incapable_algorithm(self):
        from pisa_tpu.utils import nlopt_shim as nl

        opt = nl.opt(nl.LN_NELDERMEAD, 2)
        with pytest.raises(nl.invalid_argument):
            opt.add_inequality_constraint(lambda x, g: x[0] - 0.5)

    def test_cobyla_inequality_constraint(self):
        from pisa_tpu.utils import nlopt_shim as nl

        f, _ = self._rosen()
        opt = nl.opt(nl.LN_COBYLA, 2)
        opt.set_min_objective(f)
        opt.set_lower_bounds(-2.0)
        opt.set_upper_bounds(2.0)
        # feasible iff x0 <= 0.5  (nlopt convention: fn(x) <= 0)
        opt.add_inequality_constraint(lambda x, g: x[0] - 0.5)
        opt.set_xtol_rel(1e-10)
        x = opt.optimize(np.array([0.0, 0.0]))
        assert x[0] <= 0.5 + 1e-6
        # constrained optimum of Rosenbrock on x0<=0.5 is at x0=0.5
        assert abs(x[0] - 0.5) < 5e-2

    def test_srand_determinism(self):
        from pisa_tpu.utils import nlopt_shim as nl

        f, _ = self._rosen()

        def run():
            nl.srand(42)
            opt = nl.opt(nl.G_MLSL_LDS, 2)
            opt.set_min_objective(f)
            opt.set_lower_bounds(-2.0)
            opt.set_upper_bounds(2.0)
            opt.set_maxeval(200)
            local = nl.opt(nl.LN_NELDERMEAD, 2)
            local.set_lower_bounds(-2.0)
            local.set_upper_bounds(2.0)
            local.set_maxeval(50)
            local.set_ftol_abs(1e-8)
            opt.set_local_optimizer(local)
            return opt.optimize(np.array([-1.0, 1.5]))

        assert np.allclose(run(), run())


class TestMinimizerSettingsFiles:
    """Reference minimizer settings-file schema handling
    (cf. reference ``configure_scipy_minimization.py:23-274`` and
    ``settings/minimizer/*.json``)."""

    def test_load_defaults_and_validation(self):
        from pisa_tpu.analysis.minimizer_config import (
            load_minimizer_settings,
            set_minimizer_defaults,
            validate_minimizer_settings,
        )

        mk = load_minimizer_settings(
            "settings/minimizer/slsqp_ftol1e-6_eps1e-4_maxiter1000.json"
        )
        assert mk["method"] == "slsqp"
        assert mk["options"]["ftol"] == 1e-6
        assert mk["options"]["maxiter"] == 1000

        # defaults get filled in
        s = set_minimizer_defaults(
            {"method": {"value": "l-bfgs-b", "desc": ""}}
        )
        assert "maxcor" in s["options"]["value"]

        # validation: unknown option rejected
        bad = set_minimizer_defaults(
            {"method": {"value": "slsqp", "desc": ""}}
        )
        bad["options"]["value"]["bogus"] = 1
        with pytest.raises(ValueError):
            validate_minimizer_settings(bad)

        # validation: eps below fp64 machine epsilon rejected
        bad2 = set_minimizer_defaults(
            {"method": {"value": "slsqp", "desc": ""}}
        )
        bad2["options"]["value"]["eps"] = 1e-17
        with pytest.raises(ValueError):
            validate_minimizer_settings(bad2)

    def test_fit_hypo_accepts_settings_file(self, hypo_maker, asimov_data):
        ana = Analysis()
        from pisa_tpu import FTYPE

        # the l-bfgs-b file's ftol is fp64-tuned (validation correctly
        # rejects it under fp32); the slsqp file works at both precisions
        settings_file = (
            "settings/minimizer/l-bfgs-b_ftol2e-7_gtol1e-5_eps1e-4"
            "_maxiter200.json"
            if FTYPE == np.float64
            else "settings/minimizer/slsqp_ftol1e-6_eps1e-4_maxiter1000.json"
        )
        result, _ = ana.fit_hypo(
            asimov_data,
            hypo_maker,
            "mod_chi2",
            minimizer_settings=settings_file,
        )
        assert result.metric_val < 1.0
        assert result.minimizer_metadata["method"] in ("l-bfgs-b", "slsqp")


class TestNloptGlobalEquivalents:
    """The NLopt->scipy GLOBAL translations previously crashed with
    TypeError (shgo has no maxiter kwarg; differential_evolution takes tol
    not ftol; basinhopping counts niter): each global family must at least
    run to completion with translated stopping criteria."""

    @pytest.mark.parametrize(
        "algo,kwargs",
        [
            ("GN_DIRECT", {"maxeval": 25, "ftol_abs": 1e-3}),
            ("GN_CRS2_LM", {"maxeval": 2, "ftol_rel": 1e-2}),
            ("G_MLSL", {"maxeval": 20}),
        ],
    )
    def test_runs(self, hypo_maker, asimov_data, algo, kwargs):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 43.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "nlopt",
            {"algorithm": algo, **kwargs}, None,
        )
        assert np.isfinite(result.metric_val)


class TestTrustConstrGradient:
    """trust-constr through the compiled-gradient path previously crashed
    (a blanket ftol option injected into a method that rejects it)."""

    def test_runs_and_recovers(self, hypo_maker, asimov_data, truth):
        ana = BasicAnalysis()
        hypo_maker.reset_free()
        hypo_maker.params["theta23"].value = 43.0 * ureg.degree
        result = ana.fit_recursively(
            asimov_data, hypo_maker, "mod_chi2", None, "gradient",
            {"method": "trust-constr", "options": {"maxiter": 100}}, None,
        )
        fit_t23 = result.params["theta23"].value.m_as("degree")
        assert abs(fit_t23 - truth["theta23"]) < 1.0, fit_t23
