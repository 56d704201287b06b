"""
nutau CC cross-section model interpolation (cf. reference
``pisa/stages/xsec/nutau_xsec.py``): per-event scale
``1 + f(E) * nutau_xsec_scale`` clamped at zero, with f from a vendored
interpolated model-difference file.
"""

from __future__ import annotations

import pickle

import numpy as np

import jax.numpy as jnp

from pisa_tpu import FTYPE
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.resources import find_resource

__all__ = ["nutau_xsec", "init_test"]


class nutau_xsec(Stage):  # noqa: N801
    """Params: nutau_xsec_scale (dimensionless, range [-1, 1])."""

    def __init__(
        self,
        xsec_file="cross_sections/interp_nutau_xsec_protocol2.pckl",
        **std_kwargs,
    ):
        super().__init__(
            expected_params=("nutau_xsec_scale",),
            expected_container_keys=("true_energy", "weights"),
            **std_kwargs,
        )
        self.xsec_file = xsec_file

    def setup_function(self):
        with open(find_resource(self.xsec_file), "rb") as fl:
            interp_dict = pickle.load(fl, encoding="latin1")

        for container in self.data:
            if container.name in ("nutau_cc", "nutaubar_cc"):
                key = "NuTau" if container.name == "nutau_cc" else "NuTauBar"
                energy = np.asarray(container["true_energy"])
                func = np.asarray(interp_dict[key](energy), dtype=FTYPE)
                # below the tau threshold the function is undefined; -inf
                # makes the scale clamp to zero
                func[~np.isfinite(func)] = -np.inf
                container["nutau_xsec_func"] = func

    def compute_function(self):
        scale = self.params.nutau_xsec_scale.value.m_as("dimensionless")
        for container in self.data:
            if container.name in ("nutau_cc", "nutaubar_cc"):
                container["nutau_xsec_scale"] = jnp.clip(
                    1.0 + container["nutau_xsec_func"] * scale, 0.0, None
                )
                container.mark_changed("nutau_xsec_scale")

    def apply_function(self):
        for container in self.data:
            if container.name in ("nutau_cc", "nutaubar_cc"):
                container["weights"] = (
                    container["weights"] * container["nutau_xsec_scale"]
                )


def init_test(**param_kwargs):
    """Instantiation example."""
    param_set = ParamSet(
        [Param(name="nutau_xsec_scale", value=1.0, **param_kwargs)]
    )
    return nutau_xsec(params=param_set)
