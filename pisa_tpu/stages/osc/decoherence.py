"""
Environmentally-induced decoherence oscillation model (cf. reference
``pisa/stages/osc/decoherence.py``; arXiv:1702.04738): vacuum numu
disappearance with exponential damping of the interference terms, 2-flavor
(eq. 2) or 3-flavor (unnumbered eq. between eqs. 2 and 3) approximations.

Implemented as fused jnp elementwise kernels, differentiable in the
oscillation and decoherence (gamma) parameters. Matter effects are not
implemented (matches the reference, which requires earth_model = None).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.ops.osc.layers import Layers

__all__ = ["decoherence", "init_test"]

_ALL_NU = [
    "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
    "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
    "nutaubar_nc",
]

KM_TO_INV_EV = 5.07e18 * 1e-9  # km -> 1/eV (hbar*c); reference uses 5.07e18/GeV


def numu_disappearance_2flav(E, L, theta23, dm32, gamma32_eV):
    """Eq. 2 of arXiv:1702.04738 (cf. reference
    ``_calc_numu_disappearance_prob_2flav``). E [GeV], L [km],
    gamma32 [eV]."""
    norm = 0.5 * jnp.sin(2.0 * theta23) ** 2
    decoh = jnp.exp(-gamma32_eV * (L * 1e3 / 1.97e-7))
    osc = jnp.cos(2.0 * 1.27 * dm32 * L / E)
    return norm * (1.0 - decoh * osc)


def numu_disappearance_3flav(
    E, L, theta12, theta13, theta23, dm21, dm31, gammas_GeV
):
    """3-flavor vacuum decoherence numu disappearance (cf. reference
    ``_calc_numu_disappearance_prob_3flav``). gammas = (g21, g31, g32) in
    GeV."""
    c12, s12 = jnp.cos(theta12), jnp.sin(theta12)
    c13, s13 = jnp.cos(theta13), jnp.sin(theta13)
    c23, s23 = jnp.cos(theta23), jnp.sin(theta23)
    # |U_mu,j|^2 row (real PMNS, delta_cp = 0 as in the reference)
    u2 = [
        (-s12 * c23 - c12 * s23 * s13) ** 2,
        (c12 * c23 - s12 * s23 * s13) ** 2,
        (s23 * c13) ** 2,
    ]
    dm32 = dm31 - dm21
    pairs = [
        (1, 0, gammas_GeV[0], dm21),
        (2, 0, gammas_GeV[1], dm31),
        (2, 1, gammas_GeV[2], dm32),
    ]
    prob = 0.0
    Lnat = L * 5.07e18  # km -> 1/GeV
    for j, k, gamma, dm in pairs:
        prob = prob + u2[j] * u2[k] * (
            1.0
            - jnp.exp(-gamma * Lnat)
            * jnp.cos(dm * 1.0e-18 / (2.0 * E) * Lnat)
        )
    return 2.0 * prob


class decoherence(Stage):  # noqa: N801
    """Params: standard osc params + gamma21, gamma31, gamma32."""

    def __init__(self, two_flavor=False, **std_kwargs):
        super().__init__(
            expected_params=(
                "detector_depth", "earth_model", "prop_height",
                "YeI", "YeO", "YeM",
                "theta12", "theta13", "theta23",
                "deltam21", "deltam31", "deltacp",
                "gamma21", "gamma31", "gamma32",
            ),
            expected_container_keys=(
                "true_energy", "true_coszen", "weights", "nubar", "flav",
                "nu_flux",
            ),
            **std_kwargs,
        )
        if self.params.earth_model.value is not None:
            raise ValueError(
                "Matter effects not implemented for decoherence; set"
                " 'earth_model' to None"
            )
        self.two_flavor = two_flavor
        self.layers = None

    host_param_names = (
        "earth_model", "detector_depth", "prop_height", "YeI", "YeO", "YeM",
    )

    def setup_function(self):
        prop_height = self.params.prop_height.m_as("km")
        detector_depth = self.params.detector_depth.m_as("km")
        self.layers = Layers(None, detector_depth, prop_height)

        if self.is_map:
            self.data.link_containers("nu", _ALL_NU)
        for container in self.data:
            self.layers.calcPathLength(np.asarray(container["true_coszen"]))
            container["distances"] = self.layers.distance.astype(FTYPE)
        self.data.unlink_containers()

    def compute_function(self):
        theta12 = self.params.theta12.m_as("rad")
        theta13 = self.params.theta13.m_as("rad")
        theta23 = self.params.theta23.m_as("rad")
        dm21 = self.params.deltam21.m_as("eV**2")
        dm31 = self.params.deltam31.m_as("eV**2")
        gammas_GeV = (
            self.params.gamma21.m_as("GeV"),
            self.params.gamma31.m_as("GeV"),
            self.params.gamma32.m_as("GeV"),
        )
        gamma32_eV = self.params.gamma32.m_as("eV")

        for container in self.data:
            E = jnp.asarray(container["true_energy"])
            L = jnp.asarray(container["distances"])
            flav = int(container["flav"])
            if flav == 0:
                # nue: oscillations neglected in this approximation
                prob_e = jnp.ones_like(E)
                prob_mu = jnp.zeros_like(E)
            else:
                if self.two_flavor:
                    p_dis = numu_disappearance_2flav(
                        E, L, theta23, dm31 - dm21, gamma32_eV
                    )
                else:
                    p_dis = numu_disappearance_3flav(
                        E, L, theta12, theta13, theta23, dm21, dm31,
                        gammas_GeV,
                    )
                prob_e = jnp.zeros_like(E)
                # numu: survival; nutau: appearance (unitarity, no nue mixing)
                prob_mu = 1.0 - p_dis if flav == 1 else p_dis
            container["prob_e"] = prob_e
            container["prob_mu"] = prob_mu
            container.mark_changed("prob_e")
            container.mark_changed("prob_mu")

    def apply_function(self):
        for container in self.data:
            flux = container["nu_flux"]
            container["weights"] = container["weights"] * (
                flux[:, 0] * container["prob_e"]
                + flux[:, 1] * container["prob_mu"]
            )


def init_test(**param_kwargs):
    """Instantiation example."""
    param_kwargs.pop("range", None)
    param_set = ParamSet(
        [
            Param(name="detector_depth", value=2 * ureg.km, **param_kwargs),
            Param(name="prop_height", value=20 * ureg.km, **param_kwargs),
            Param(name="earth_model", value=None, **param_kwargs),
            Param(name="YeI", value=0.4656, **param_kwargs),
            Param(name="YeO", value=0.4656, **param_kwargs),
            Param(name="YeM", value=0.4957, **param_kwargs),
            Param(name="theta12", value=33.48 * ureg.degree, **param_kwargs),
            Param(name="theta13", value=8.5 * ureg.degree, **param_kwargs),
            Param(name="theta23", value=42.3 * ureg.degree, **param_kwargs),
            Param(name="deltam21", value=7.5e-5 * ureg.eV**2, **param_kwargs),
            Param(name="deltam31", value=2.457e-3 * ureg.eV**2, **param_kwargs),
            Param(name="deltacp", value=0 * ureg.degree, **param_kwargs),
            Param(name="gamma21", value=0.0 * ureg.eV, **param_kwargs),
            Param(name="gamma31", value=0.0 * ureg.eV, **param_kwargs),
            Param(name="gamma32", value=0.0 * ureg.eV, **param_kwargs),
        ]
    )
    return decoherence(params=param_set)
