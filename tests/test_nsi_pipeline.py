"""
Non-standard-interaction pipelines end to end: eager evaluation with NSI
parameters, template compilation, and analytic gradients w.r.t. free NSI
couplings via the trace-safe split-complex builders (cf. reference
``pisa/stages/osc/prob3.py`` NSI options and
``pisa/stages/osc/nsi_params.py``, which are fit by finite differences
upstream).
"""

import numpy as np

from pisa_tpu import ureg
from pisa_tpu.config.parser import parse_pipeline_config
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.pipeline import Pipeline

EPS_NAMES = (
    "eps_ee",
    "eps_emu_magn",
    "eps_emu_phase",
    "eps_etau_magn",
    "eps_etau_phase",
    "eps_mumu",
    "eps_mutau_magn",
    "eps_mutau_phase",
    "eps_tautau",
)


def _nsi_config(eps_mutau=0.0):
    cfg = parse_pipeline_config("settings/pipeline/osc_example_coarse.cfg")
    sec = cfg[("osc", "prob3")]
    sec["nsi_type"] = "standard"
    extra = []
    for name in EPS_NAMES:
        val = eps_mutau if name == "eps_mutau_magn" else 0.0
        unit = ureg.rad if name.endswith("phase") else ureg.dimensionless
        extra.append(Param(name=name, value=val * unit, is_fixed=True))
    sec["params"].update(ParamSet(extra))
    return cfg


def test_nsi_pipeline_eager_and_compiled():
    p_std = Pipeline(_nsi_config(eps_mutau=0.0))
    p_nsi = Pipeline(_nsi_config(eps_mutau=0.2))

    out_std = p_std.get_outputs()
    out_nsi = p_nsi.get_outputs()
    h_std = np.asarray(out_std["numu_cc"].hist)
    h_nsi = np.asarray(out_nsi["numu_cc"].hist)
    # a large eps_mutau visibly changes numu survival
    assert not np.allclose(h_std, h_nsi, rtol=1e-3)

    # template compiles with the NSI params fixed and matches eager
    ct = p_nsi.compile()
    r = ct(ct.current_rescaled_values())
    tot_c = float(np.asarray(r["hist"]["numu_cc"]).sum())
    tot_e = float(h_nsi.sum())
    assert np.isclose(tot_c, tot_e, rtol=1e-6)


def test_decay_pipeline_compiles_with_free_alpha3():
    """Neutrino-decay pipelines: alpha3 visibly damps the template, and a
    compiled template yields a nonzero analytic gradient w.r.t. it."""
    cfg = parse_pipeline_config("settings/pipeline/osc_example_coarse.cfg")
    sec = cfg[("osc", "prob3")]
    sec["neutrino_decay"] = True
    sec["params"].update(
        ParamSet(
            [
                Param(
                    name="decay_alpha3",
                    value=0.0 * ureg.eV**2,
                    range=(0.0, 1e-3) * ureg.eV**2,
                    is_fixed=False,
                )
            ]
        )
    )
    p = Pipeline(cfg)
    base = np.asarray(p.get_outputs()["numu_cc"].hist).copy()
    p.params["decay_alpha3"].value = 2e-4 * ureg.eV**2
    decayed = np.asarray(p.get_outputs()["numu_cc"].hist)
    assert decayed.sum() < base.sum()  # nu3 decay removes flux

    ct = p.compile()
    data = ct.get_outputs()
    _, vag = ct.build_objective(data, "mod_chi2")
    v0 = np.clip(ct.current_rescaled_values() + 0.05, 0.05, 0.95)
    _, grad = vag(v0)
    k = ct.free_names.index("decay_alpha3")
    assert np.isfinite(np.asarray(grad)).all()
    assert np.asarray(grad)[k] != 0.0


def test_lri_pipeline_eager_effect():
    cfg = parse_pipeline_config("settings/pipeline/osc_example_coarse.cfg")
    sec = cfg[("osc", "prob3")]
    sec["lri_type"] = "mutau-symmetry"
    sec["params"].update(
        ParamSet(
            [
                Param(
                    name="v_lri",
                    value=0.0 * ureg.eV,
                    range=(0.0, 1e-13) * ureg.eV,
                    is_fixed=False,
                )
            ]
        )
    )
    p = Pipeline(cfg)
    base = np.asarray(p.get_outputs()["numu_cc"].hist).copy()
    p.params["v_lri"].value = 5e-14 * ureg.eV
    shifted = np.asarray(p.get_outputs()["numu_cc"].hist)
    assert not np.allclose(base, shifted, rtol=1e-4)
    # compiled-gradient machinery for a traced coupling is identical to the
    # decay test's (same builder/kernel plumbing); eager physics suffices
    # here and keeps the suite's compile load down


def test_free_nsi_param_gradient_flows():
    """NSI couplings are trace-safe: a compiled template with a free
    eps_mutau magnitude yields a nonzero analytic gradient (beyond the
    reference, which fits NSI with finite differences)."""
    cfg = _nsi_config(eps_mutau=0.1)
    pipeline = Pipeline(cfg)
    prm = pipeline.params["eps_mutau_magn"]
    prm.range = (0.0, 0.5) * ureg.dimensionless
    prm.is_fixed = False
    ct = pipeline.compile()
    assert "eps_mutau_magn" in ct.free_names

    data = ct.get_outputs()
    _, vag = ct.build_objective(data, "mod_chi2")
    v0 = np.clip(ct.current_rescaled_values() + 0.07, 0.05, 0.95)
    loss, grad = vag(v0)
    grad = np.asarray(grad)
    assert np.isfinite(float(loss)) and np.all(np.isfinite(grad))
    k = ct.free_names.index("eps_mutau_magn")
    assert grad[k] != 0.0
