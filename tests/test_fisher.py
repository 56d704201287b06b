"""
Fisher-matrix / pull-method tests: the analytic Fisher uncertainty must
match the llh curvature from an explicit scan, and the pull method must
linearly recover an injected parameter shift.
"""

import numpy as np
import pytest

from pisa_tpu.analysis.fisher import (
    FisherMatrix,
    calculate_pulls,
    get_fisher_matrix,
)
from pisa_tpu.core.pipeline import Pipeline


@pytest.fixture(scope="module")
def ct():
    from pisa_tpu.utils.resources import find_resource
    import tempfile, os

    src = open(find_resource("settings/pipeline/toy_fit_example.cfg")).read()
    src = src.replace("calc_grid_coarse", "tiny_grid")
    d = tempfile.mkdtemp()
    path = os.path.join(d, "toy_tiny.cfg")
    open(path, "w").write(src)
    p = Pipeline(path)
    for prm in p.params.free:
        if prm.name not in ("theta23", "aeff_scale"):
            prm.is_fixed = True
    return p.compile()


def test_fisher_matches_llh_curvature(ct):
    fm = get_fisher_matrix(ct, priors=False)
    assert fm.matrix.shape == (2, 2)
    # positive definite
    assert np.all(np.linalg.eigvalsh(fm.matrix) > 0)

    # compare fixed-others sigma on aeff_scale with an explicit -2lnL scan
    data = ct.get_outputs()
    value_only, _ = ct.build_objective(data, "llh", priors=False)
    v0 = ct.current_rescaled_values()
    i = ct.free_names.index("aeff_scale")
    lo, hi, _ = ct._rescale[i]

    eps_resc = 0.01
    vp, vm = v0.copy(), v0.copy()
    vp[i] += eps_resc
    vm[i] -= eps_resc
    f0 = float(value_only(v0))
    curv_resc = (
        float(value_only(vp)) - 2 * f0 + float(value_only(vm))
    ) / eps_resc**2
    curv_phys = curv_resc / (hi - lo) ** 2  # d2(-lnL)/d(aeff_scale)^2
    sigma_scan = 1.0 / np.sqrt(curv_phys)
    sigma_fisher = fm.get_sigma("aeff_scale", marginalized=False)
    assert sigma_fisher == pytest.approx(sigma_scan, rel=0.05)


def test_pull_method_recovers_injected_shift(ct):
    v0 = ct.current_rescaled_values()
    i = ct.free_names.index("aeff_scale")
    lo, hi, _ = ct._rescale[i]

    # inject a small aeff_scale shift into the data
    v_shift = v0.copy()
    delta_resc = 0.02
    v_shift[i] += delta_resc
    data = ct(np.asarray(v_shift))["hist"]
    pulls = calculate_pulls(ct, {k: np.asarray(v) for k, v in data.items()})
    expected_phys = delta_resc * (hi - lo)
    assert pulls["aeff_scale"] == pytest.approx(expected_phys, rel=0.05)
    # theta23 unshifted
    t23_span = ct._rescale[ct.free_names.index("theta23")]
    assert abs(pulls["theta23"]) < 0.05 * (t23_span[1] - t23_span[0])


def test_fisher_matrix_operations():
    m = np.array([[4.0, 1.0], [1.0, 2.0]])
    fm = FisherMatrix(m, ["a", "b"], [0.0, 0.0])
    sig_marg = fm.get_sigma("a")
    sig_fix = fm.get_sigma("a", marginalized=False)
    assert sig_marg > sig_fix  # marginalization only widens

    fm.add_prior("b", 0.5)
    assert fm.matrix[1, 1] == pytest.approx(2.0 + 4.0)

    fm2 = FisherMatrix(m.copy(), ["a", "b"], [0.0, 0.0])
    fm2.fix_parameter("b")
    assert fm2.parameters == ["a"]
    assert fm2.get_sigma("a") == pytest.approx(1.0 / 2.0)

    fm3 = FisherMatrix(m.copy(), ["a", "b"], [0.0, 0.0])
    sig_a_marg = fm3.get_sigma("a")
    fm3.remove_parameter("b")
    assert fm3.get_sigma("a") == pytest.approx(sig_a_marg)
