"""
MCMC ensemble-sampler tests: the posterior on a toy theta23 Asimov fit must
match the curvature of the (profile) likelihood (cf. the reference's
MCMC_example notebook workflow; ``bayesian_analysis.py:23``).
"""

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.analysis.bayesian import mcmc_sampling
from pisa_tpu.core.pipeline import Pipeline


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from pisa_tpu.utils.resources import find_resource

    # tiny-grid variant of the toy fit pipeline: MCMC steps are sequential,
    # so shrink the per-step template cost for the CPU test runner
    src = open(find_resource("settings/pipeline/toy_fit_example.cfg")).read()
    src = src.replace("calc_grid_coarse", "tiny_grid")
    path = tmp_path_factory.mktemp("mcmc") / "toy_tiny.cfg"
    path.write_text(src)
    p = Pipeline(str(path))
    # single free param for a clean 1-d posterior
    for prm in p.params.free:
        if prm.name != "theta23":
            prm.is_fixed = True
    ct = p.compile()
    data = ct.get_outputs()
    return p, ct, data


def test_posterior_matches_likelihood_curvature(setup):
    p, ct, data = setup
    chain, logp, acceptance = mcmc_sampling(
        ct, data, metric="llh", n_walkers=16, n_steps=200, n_burnin=100,
        seed=1,
    )
    assert chain.shape == (200, 16, 1)
    assert 0.1 < acceptance < 0.95, acceptance

    samples = chain[:, :, 0].ravel()

    # analytic posterior by numerical integration of exp(-objective) over
    # the parameter range (the theta23 posterior is octant-bimodal, so
    # compare moments of the full posterior, not a gaussian)
    value_only, _ = ct.build_objective(data, "llh")
    xs = np.linspace(0.0, 1.0, 201)
    neg_logp = np.array([float(value_only(np.asarray([x]))) for x in xs])
    p = np.exp(-(neg_logp - neg_logp.min()))
    p /= np.trapezoid(p, xs)
    mean_expected = np.trapezoid(xs * p, xs)
    var_expected = np.trapezoid((xs - mean_expected) ** 2 * p, xs)
    std_expected = np.sqrt(var_expected)

    assert samples.mean() == pytest.approx(mean_expected, abs=0.3 * std_expected)
    assert samples.std() == pytest.approx(std_expected, rel=0.25)


def test_chain_reproducible(setup):
    _, ct, data = setup
    c1, _, _ = mcmc_sampling(
        ct, data, metric="llh", n_walkers=8, n_steps=20, n_burnin=10, seed=7
    )
    c2, _, _ = mcmc_sampling(
        ct, data, metric="llh", n_walkers=8, n_steps=20, n_burnin=10, seed=7
    )
    assert np.array_equal(c1, c2)
