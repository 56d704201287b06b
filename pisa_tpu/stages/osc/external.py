"""
User-supplied oscillation-probability hook (cf. reference
``pisa/stages/osc/external.py``): computes Earth-layer chains like prob3,
then calls a user-provided callable ``osc_prob`` to fill the (N, 3, 3)
probability array; weights are applied exactly as in prob3.

Set ``stage.osc_prob = fn`` (and optionally ``stage.external_params``)
before/after setup; the callable signature is
``fn(energy, densities, distances, nubar, **external_params) -> (N, 3, 3)``.
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.ops.osc.layers import Layers

__all__ = ["external", "init_test"]

_ALL_NU = [
    "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
    "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
    "nutaubar_nc",
]
_NU = _ALL_NU[:6]
_NUBAR = _ALL_NU[6:]


class external(Stage):  # noqa: N801
    """Params: detector_depth, earth_model, prop_height, YeI, YeO, YeM."""

    def __init__(self, **std_kwargs):
        super().__init__(
            expected_params=(
                "detector_depth", "earth_model", "prop_height",
                "YeI", "YeO", "YeM",
            ),
            expected_container_keys=(
                "true_energy", "true_coszen", "nubar", "flav", "nu_flux",
                "weights",
            ),
            **std_kwargs,
        )
        self.osc_prob = None
        self.external_params = None
        self.layers = None

    host_param_names = (
        "earth_model", "detector_depth", "prop_height", "YeI", "YeO", "YeM",
    )

    def setup_function(self):
        earth_model = self.params.earth_model.value
        prop_height = self.params.prop_height.m_as("km")
        detector_depth = self.params.detector_depth.m_as("km")
        self.layers = Layers(earth_model, detector_depth, prop_height)
        self.layers.setElecFrac(
            self.params.YeI.m_as("dimensionless"),
            self.params.YeO.m_as("dimensionless"),
            self.params.YeM.m_as("dimensionless"),
        )
        if self.is_map:
            self.data.link_containers("nu", _ALL_NU)
        for container in self.data:
            self.layers.calcLayers(np.asarray(container["true_coszen"]))
            container["densities"] = self.layers.density.reshape(
                (container.size, self.layers.max_layers)
            )
            container["distances"] = self.layers.distance.reshape(
                (container.size, self.layers.max_layers)
            )
        self.data.unlink_containers()

    def compute_function(self):
        if self.osc_prob is None:
            raise RuntimeError(
                "osc.external requires `stage.osc_prob` to be set to a"
                " callable (energy, densities, distances, nubar, **params)"
                " -> (N, 3, 3)"
            )
        if self.is_map:
            self.data.link_containers("nu", _NU)
            self.data.link_containers("nubar", _NUBAR)
        kwargs = dict(self.external_params or {})
        for container in self.data:
            probs = self.osc_prob(
                np.asarray(container["true_energy"]),
                np.asarray(container["densities"]),
                np.asarray(container["distances"]),
                int(container["nubar"]),
                **kwargs,
            )
            container["probability"] = np.asarray(probs, dtype=FTYPE)
            container.mark_changed("probability")
        self.data.unlink_containers()

        for container in self.data:
            flav = int(container["flav"])
            probs = container["probability"]
            container["prob_e"] = probs[:, 0, flav]
            container["prob_mu"] = probs[:, 1, flav]
            container.mark_changed("prob_e")
            container.mark_changed("prob_mu")

    def apply_function(self):
        for container in self.data:
            nu_flux = container["nu_flux"]
            container["weights"] = container["weights"] * (
                nu_flux[:, 0] * container["prob_e"]
                + nu_flux[:, 1] * container["prob_mu"]
            )


def init_test(**param_kwargs):
    """Instantiation example (vacuum-like dummy probability callable)."""
    param_set = ParamSet(
        [
            Param(name="detector_depth", value=2 * ureg.km, **param_kwargs),
            Param(name="prop_height", value=20 * ureg.km, **param_kwargs),
            Param(
                name="earth_model", value="osc/PREM_4layer.dat", **param_kwargs
            ),
            Param(name="YeI", value=0.4656, **param_kwargs),
            Param(name="YeO", value=0.4656, **param_kwargs),
            Param(name="YeM", value=0.4957, **param_kwargs),
        ]
    )
    stage = external(params=param_set)

    def dummy_prob(energy, densities, distances, nubar):
        n = energy.shape[0]
        probs = np.zeros((n, 3, 3), dtype=FTYPE)
        probs[:, 0, 0] = 1.0
        probs[:, 1, 1] = 0.5
        probs[:, 1, 2] = 0.5
        probs[:, 2, 2] = 1.0
        return probs

    stage.osc_prob = dummy_prob
    return stage
