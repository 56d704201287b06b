"""On-device fit tests: L-BFGS inside lax.while_loop (one dispatch per
fit), vmapped multi-start and pseudo-experiment ensemble fits, and the
Analysis method='device' integration (cf. the host 'gradient' path tested
in tests/test_analysis.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pisa_tpu import ureg
from pisa_tpu.analysis import device_fit
from pisa_tpu.analysis.analysis import Analysis, HypoFitResult
from pisa_tpu.analysis.gradient import CompiledDistribution
from pisa_tpu.core.distribution_maker import DistributionMaker


# ----------------------------------------------------------- pure machinery
def _quad_raw(vec, los, his, datas=None):
    # minimum inside the box at x = (0.3, 0.7)
    target = jnp.asarray([0.3, 0.7])
    return jnp.sum((vec - target) ** 2) + 1.5


def _quad_raw_with_data(vec, los, his, datas=None, data_arg=None):
    target = jnp.asarray([0.3, 0.7]) if data_arg is None else data_arg
    return jnp.sum((vec - target) ** 2)


def test_minimize_on_device_quadratic():
    res = device_fit.minimize_on_device(
        _quad_raw, [0.9, 0.1], np.zeros(2), np.ones(2), None
    )
    assert np.allclose(res["x"], [0.3, 0.7], atol=1e-4)
    assert res["fun"] == pytest.approx(1.5, abs=1e-8)
    assert 0 < res["nit"] <= 200


def test_minimize_on_device_runner_cached():
    device_fit.minimize_on_device(
        _quad_raw, [0.5, 0.5], np.zeros(2), np.ones(2), None
    )
    assert hasattr(_quad_raw, "_device_fit_runner")
    # changed tolerances reuse the same compiled program (runtime args)
    res = device_fit.minimize_on_device(
        _quad_raw, [0.2, 0.9], np.zeros(2), np.ones(2), None,
        max_steps=50, gtol=1e-4,
    )
    assert np.allclose(res["x"], [0.3, 0.7], atol=1e-3)


def test_fit_batch_multistart():
    x0s = np.array([[0.1, 0.1], [0.9, 0.9], [0.5, 0.2]])
    xb, fb, nb = device_fit.fit_batch_on_device(
        _quad_raw_with_data, x0s, np.zeros(2), np.ones(2), None, None
    )
    xb = np.asarray(xb)
    assert xb.shape == (3, 2)
    assert np.allclose(xb, [0.3, 0.7], atol=1e-4)
    assert np.allclose(np.asarray(fb), 0.0, atol=1e-8)


def test_fit_batch_per_lane_data():
    # each lane has its own target supplied as the data argument
    targets = np.array([[0.2, 0.8], [0.6, 0.4]])
    x0s = np.full((2, 2), 0.5)
    xb, fb, _ = device_fit.fit_batch_on_device(
        _quad_raw_with_data, x0s, np.zeros(2), np.ones(2), None, targets
    )
    # x-accuracy is bounded by the precision-dependent gradient tolerance:
    # for this quadratic |x - t| <= gtol / 2 at convergence
    assert np.allclose(
        np.asarray(xb), targets, atol=device_fit.DEFAULT_GTOL
    )


def test_bounds_respected():
    # unconstrained minimum at 1.5 -> fit must stay inside (0, 1)
    def raw(vec, los, his, datas=None):
        return jnp.sum((vec - 1.5) ** 2)

    res = device_fit.minimize_on_device(
        raw, [0.5], np.zeros(1), np.ones(1), None, max_steps=100
    )
    assert 0.0 < res["x"][0] <= 1.0
    assert res["x"][0] > 0.95  # pushed to the upper boundary


def test_nonfinite_guard():
    # objective NaN away from target: guard must let the fit proceed
    def raw(vec, los, his, datas=None):
        v = jnp.sum((vec - 0.5) ** 2)
        return jnp.where(vec[0] > 0.9, jnp.nan, v)

    res = device_fit.minimize_on_device(
        raw, [0.2], np.zeros(1), np.ones(1), None
    )
    assert np.isfinite(res["fun"])
    assert abs(res["x"][0] - 0.5) < 1e-3


# ------------------------------------------------------- real-pipeline fits
@pytest.fixture(scope="module")
def flux_maker():
    hm = DistributionMaker(
        ["settings/pipeline/toy_flux_fit.cfg"], label="toyflux"
    )
    return hm


# delta_index truth at its Gaussian-prior center so the objective minimum
# coincides with the injected truth (metric -> 0); the other two carry
# uniform priors
TRUTH = dict(delta_index=0.0, theta23=0.85, aeff_scale=1.2)


@pytest.fixture(scope="module")
def flux_truth(flux_maker):
    for name, val in TRUTH.items():
        flux_maker.params[name].value = val
    data = flux_maker.get_outputs(return_sum=True)
    flux_maker.reset_free()
    return data


def test_device_method_recovers_truth(flux_maker, flux_truth):
    ana = Analysis()
    flux_maker.params["delta_index"].value = -0.05
    flux_maker.params["theta23"].value = 0.95
    flux_maker.params["aeff_scale"].value = 0.8
    result = ana.fit_recursively(
        flux_truth, flux_maker, "mod_chi2", None, "device", {}, None
    )
    assert isinstance(result, HypoFitResult)
    assert result.metric_val < 1e-6
    assert result.minimizer_metadata["method"] == "device_lbfgs"
    assert result.minimizer_metadata["nit"] > 0
    for name, val in TRUTH.items():
        fit = result.params[name].value.magnitude
        assert abs(fit - val) < 5e-3, (name, fit)


def test_device_matches_host_gradient(flux_maker, flux_truth):
    ana = Analysis()
    flux_maker.reset_free()
    flux_maker.params["delta_index"].value = -0.02
    r_dev = ana.fit_recursively(
        flux_truth, flux_maker, "mod_chi2", None, "device", {}, None
    )
    flux_maker.reset_free()
    flux_maker.params["delta_index"].value = -0.02
    r_host = ana.fit_recursively(
        flux_truth, flux_maker, "mod_chi2", None, "gradient", {}, None
    )
    for name in TRUTH:
        assert (
            abs(
                r_dev.params[name].value.magnitude
                - r_host.params[name].value.magnitude
            )
            < 5e-3
        )


def test_pseudo_ensemble(flux_maker, flux_truth):
    flux_maker.reset_free()
    for name, val in TRUTH.items():
        flux_maker.params[name].value = val
    cd = CompiledDistribution(flux_maker)
    # llh (Poisson) is asymptotically unbiased for the normalization,
    # unlike Neyman-style mod_chi2 which pulls high on low-stat bins
    ens = device_fit.fit_pseudo_ensemble(
        cd, "llh", n_trials=16, seed=3, max_steps=60
    )
    assert ens["x"].shape == (16, 3)
    assert np.all(np.isfinite(ens["fun"]))
    assert np.all(ens["nit"] > 0)
    i_a = ens["free_names"].index("aeff_scale")
    fits = ens["magnitudes"][:, i_a]
    # unbiased around the injected truth, spread consistent with stats
    assert abs(np.mean(fits) - TRUTH["aeff_scale"]) < 0.1, fits
    assert 0.0 < np.std(fits) < 0.5
    # every trial's data differs (actual fluctuation happened)
    assert len({d.tobytes() for d in ens["data"]}) == 16
