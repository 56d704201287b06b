"""
Pseudo-experiment ensemble, generated and fit entirely on device.

The reference runs pseudo-experiment studies as host loops —
``Map.fluctuate`` (``pisa/core/map.py:1118``) per trial, then a full
minimizer run per trial (optionally farmed over llh-server processes,
``pisa/utils/llh_server.py``). Here the Poisson fluctuation AND all N
bounded L-BFGS fits execute inside ONE jitted XLA program
(`pisa_tpu.analysis.device_fit.fit_pseudo_ensemble`), so the whole study
is a single device dispatch.

Run:  python examples/pseudo_ensemble.py [n_trials] [pipeline_cfg]

The default pipeline is the fast two-flavor toy; pass
``settings/pipeline/toy_fit_example.cfg`` for the full 3-flavor
matter-oscillation version (much longer compile on CPU).
"""

import sys
import time

import numpy as np

from pisa_tpu.analysis.device_fit import fit_pseudo_ensemble
from pisa_tpu.analysis.gradient import CompiledDistribution
from pisa_tpu.core.distribution_maker import DistributionMaker


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "settings/pipeline/toy_flux_fit.cfg"
    )

    hm = DistributionMaker([cfg], label="toy")
    truth = {
        name: hm.params[name].value for name in hm.params.free.names
    }
    cd = CompiledDistribution(hm)

    t0 = time.time()
    ens = fit_pseudo_ensemble(
        cd, "llh", n_trials=n_trials, seed=42, max_steps=80
    )
    dt = time.time() - t0
    print(
        f"{n_trials} pseudo-experiments fluctuated + fit on device in"
        f" {dt:.1f} s ({dt / n_trials * 1000:.0f} ms/fit incl. compile)"
    )
    for i, name in enumerate(ens["free_names"]):
        fits = ens["magnitudes"][:, i]
        print(
            f"  {name:>12}: truth={truth.get(name, '(free)')}"
            f"  mean={np.mean(fits):.4g}  std={np.std(fits):.4g}"
        )
    print(
        f"  iterations: median {int(np.median(ens['nit']))},"
        f" max {int(ens['nit'].max())}"
    )


if __name__ == "__main__":
    main()
