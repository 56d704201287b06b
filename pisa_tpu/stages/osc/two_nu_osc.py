"""
Two-flavor vacuum oscillation approximation (cf. reference
``pisa/stages/osc/two_nu_osc.py``): P(numu->nutau) = sin^2(2 theta23)
sin^2(1.267 dm31 L / E) with the production-height path length; applied as
fused jnp elementwise ops (the reference uses per-event guvectorize).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pisa_tpu import ureg
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage

__all__ = ["two_nu_osc", "calc_probs", "init_test"]

L1_KM = 19.0  # atmospheric production height
R_KM = 6378.2 + L1_KM  # mean Earth radius + L1


def calc_probs(t23, dm31, true_energy, true_coszen):
    """numu->nutau transition probability factor
    (cf. reference ``two_nu_osc.py:calc_probs``; `t23` is sin^2(2theta23)
    passed as 'theta' magnitude, matching the reference convention)."""
    phi = jnp.arcsin((1 - L1_KM / R_KM) * jnp.sin(jnp.arccos(true_coszen)))
    psi = jnp.arccos(true_coszen) - phi
    propdist = jnp.sqrt(
        (R_KM - L1_KM) ** 2
        + R_KM**2
        - 2 * (R_KM - L1_KM) * R_KM * jnp.cos(psi)
    )
    return t23 * jnp.sin(1.267 * dm31 * propdist / true_energy) ** 2


class two_nu_osc(Stage):  # noqa: N801
    """Params: theta23 (dimensionless amplitude), deltam31 (eV^2)."""

    def __init__(self, **std_kwargs):
        super().__init__(
            expected_params=("theta23", "deltam31"),
            expected_container_keys=(
                "true_energy", "true_coszen", "nu_flux", "weights",
            ),
            **std_kwargs,
        )

    def apply_function(self):
        theta = self.params.theta23.value.m_as("dimensionless")
        dm31 = self.params.deltam31.value.m_as("eV**2")

        for container in self.data:
            flux = container["nu_flux"]
            e = container["true_energy"]
            cz = container["true_coszen"]
            if "numu" in container.name:
                p = 1.0 - calc_probs(theta, dm31, e, cz)
                container["weights"] = container["weights"] * flux[:, 1] * p
            elif "nutau" in container.name:
                p = calc_probs(theta, dm31, e, cz)
                container["weights"] = container["weights"] * flux[:, 1] * p
            else:  # nue: unoscillated
                container["weights"] = container["weights"] * flux[:, 0]
            container.mark_changed("weights")


def init_test(**param_kwargs):
    """Instantiation example."""
    param_kwargs.pop("range", None)
    param_set = ParamSet(
        [
            Param(
                name="theta23", value=0.95,
                range=[0, 1] * ureg.dimensionless, **param_kwargs,
            ),
            Param(
                name="deltam31", value=2.5e-3 * ureg.eV**2,
                range=[1e-3, 7e-3] * ureg.eV**2, **param_kwargs,
            ),
        ]
    )
    return two_nu_osc(params=param_set)
