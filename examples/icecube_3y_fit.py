"""
IceCube 3-year oscillation analysis (cf. reference
``pisa_examples/IceCube_3y_oscillations_example.ipynb``): the three-pipeline
hypothesis (neutrinos + atmospheric-muon background) fit to the data-release
counts -- here run as an Asimov theta23 fit on the neutrino pipeline plus
the muon background, using the compiled gradient path.

NOTE: the vendored neutrino_mc.csv.bz2 is a synthetic stand-in with the
data-release schema; swap in the real release file for physics results.
"""

import time

from pisa_tpu import ureg
from pisa_tpu.analysis.analysis import Analysis
from pisa_tpu.core.distribution_maker import DistributionMaker


def main():
    dm = DistributionMaker(
        [
            "settings/pipeline/IceCube_3y_neutrinos.cfg",
            "settings/pipeline/IceCube_3y_muons.cfg",
        ],
        label="IceCube 3y",
    )
    print("free params:", dm.params.free.names)

    # Asimov: truth template at nominal parameters
    truth_t23 = dm.params["theta23"].value
    data = dm.get_outputs(return_sum=True)

    # perturb and fit back with analytic gradients
    dm.params["theta23"].value = truth_t23 + 3.0 * ureg.degree
    ana = Analysis()
    t0 = time.time()
    result = ana.fit_recursively(
        data, dm, "mod_chi2", None, "gradient", {}, None
    )
    print(
        "fit %.1fs: metric %.3g, theta23 = %s (truth %s)"
        % (
            time.time() - t0,
            result.metric_val,
            result.params["theta23"].value,
            truth_t23,
        )
    )
    return result


if __name__ == "__main__":
    main()
