"""
Integration: the generalized Poisson-gamma llh evaluated and differentiated
through a compiled pipeline template (toy events -> aeff -> add_indices ->
generalized_llh_params).
"""

import numpy as np
import pytest

from pisa_tpu.core.pipeline import Pipeline


@pytest.fixture(scope="module")
def pipeline():
    return Pipeline("settings/pipeline/toy_generalized_llh.cfg")


def test_compiled_generalized_llh_objective(pipeline):
    ct = pipeline.compile()
    data_dist = ct.get_outputs()

    value_only, value_and_grad = ct.build_objective(
        data_dist, "generalized_poisson_llh"
    )
    v0 = ct.current_rescaled_values()
    val0 = float(value_only(v0))
    assert np.isfinite(val0)

    # objective is minimized (llh sign-flipped): shifting aeff_scale away
    # from truth must increase it
    i = ct.free_names.index("aeff_scale")
    v1 = v0.copy()
    v1[i] = min(v0[i] + 0.15, 1.0)
    val1 = float(value_only(v1))
    assert val1 > val0

    # analytic gradient agrees with finite differences
    val, grad = value_and_grad(v1)
    eps = 1e-4
    vp, vm = v1.copy(), v1.copy()
    vp[i] += eps
    vm[i] -= eps
    fd = (float(value_only(vp)) - float(value_only(vm))) / (2 * eps)
    assert np.isclose(float(np.asarray(grad)[i]), fd, rtol=1e-3)


def test_llh_alphas_exported_by_template(pipeline):
    ct = pipeline.compile()
    out = ct(ct.current_rescaled_values())
    assert "llh_alphas" in out and "llh_betas" in out and "n_mc_events" in out
    a = np.asarray(out["llh_alphas"]["numu_cc"])
    b = np.asarray(out["llh_betas"]["numu_cc"])
    assert a.shape == (64,) and np.all(a > 0) and np.all(b > 0)
