"""
Neutrino mass-ordering (NMO) Asimov sensitivity — PISA's headline analysis
(cf. reference ``pisa_examples/IceCube_3y_oscillations_example.ipynb`` and
the NMO studies the framework was built for).

Procedure: generate Asimov data under the NORMAL-ordering parameter
selection, then fit the data under both the 'nh' and 'ih' selections
(free oscillation + systematic params re-optimized per hypothesis via the
compiled analytic-gradient objective). The ordering sensitivity is

    Delta chi2 = chi2_best(IH hypothesis) - chi2_best(NH hypothesis)

(NH fit of NH truth should land at ~0). Uses the toy pipeline so it runs
anywhere; swap in the IceCube_3y configs for the real thing.
"""

import time

from pisa_tpu.analysis.analysis import Analysis
from pisa_tpu.core.distribution_maker import DistributionMaker


def fit_ordering(dm, data, selection):
    """Best-fit metric under one mass-ordering selection."""
    dm.select_params([selection, "earth"])
    dm.reset_free()
    result = Analysis().fit_recursively(
        data, dm, "mod_chi2", None, "gradient", {}, None
    )
    return result


def main(config="settings/pipeline/example.cfg"):
    dm = DistributionMaker([config], label="nmo")

    # Asimov truth: normal ordering at nominal parameters
    dm.select_params(["nh", "earth"])
    data = dm.get_outputs(return_sum=True)

    t0 = time.time()
    res_nh = fit_ordering(dm, data, "nh")
    res_ih = fit_ordering(dm, data, "ih")
    dt = time.time() - t0

    delta_chi2 = res_ih.metric_val - res_nh.metric_val
    print(f"NH fit:  chi2 = {res_nh.metric_val:.4g}  "
          f"dm31 = {res_nh.params['deltam31'].value}")
    print(f"IH fit:  chi2 = {res_ih.metric_val:.4g}  "
          f"dm31 = {res_ih.params['deltam31'].value}")
    print(f"NMO Asimov sensitivity: Delta chi2 = {delta_chi2:.4g} "
          f"(both fits {dt:.0f}s)")
    assert res_nh.metric_val < 1e-2, "NH fit of NH truth should be ~exact"
    assert delta_chi2 >= 0.0
    return delta_chi2


if __name__ == "__main__":
    main()
