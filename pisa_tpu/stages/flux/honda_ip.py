"""
Nominal atmospheric flux from Honda tables via integral-preserving splines
(cf. reference ``pisa/stages/flux/honda_ip.py``).

The flux table is a fixed (host) parameter and the nominal flux carries no
free parameters, so evaluation is host-side numpy/scipy at compute time
(vectorized; see ``pisa_tpu.utils.flux_weights``); the per-point flux arrays
enter compiled templates as constants.
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.flux_weights import (
    calculate_2d_flux_weights,
    load_2d_table,
)

__all__ = ["honda_ip", "init_test"]

_ALL_NU = [
    "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
    "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
    "nutaubar_nc",
]


class honda_ip(Stage):  # noqa: N801
    """Fills nu_flux_nominal / nubar_flux_nominal [:, (nue, numu)]."""

    def __init__(self, **std_kwargs):
        super().__init__(
            expected_params=("flux_table",),
            expected_container_keys=("true_energy", "true_coszen"),
            **std_kwargs,
        )
        self.flux_table = None

    # the flux table path steers host-side table loading; it cannot be traced
    host_param_names = ("flux_table",)

    # never touches event weights (fills nominal flux fields only)
    stacked_rate_defer_safe = True

    # grid mode: the nominal flux is computed on the shared calc grid and is
    # category-independent, so the stacked container stores it as ONE shared
    # array (events mode would need per-category padding-aware evaluation)
    def stacked_ok(self):
        return self.is_map

    def setup_function(self):
        self.flux_table = load_2d_table(str(self.params.flux_table.value))

        if self.is_map:
            # flux doesn't depend on the (outgoing) flavor: compute once
            self.data.link_containers("nu", _ALL_NU)
        for container in self.data:
            container["nu_flux_nominal"] = np.empty(
                (container.size, 2), dtype=FTYPE
            )
            container["nubar_flux_nominal"] = np.empty(
                (container.size, 2), dtype=FTYPE
            )
        self.data.unlink_containers()

    def compute_function(self):
        if self.is_map:
            self.data.link_containers("nu", _ALL_NU)

        for container in self.data:
            e = np.asarray(container["true_energy"], dtype=np.float64)
            cz = np.clip(
                np.asarray(container["true_coszen"], dtype=np.float64), -1, 1
            )
            nu = np.empty((e.size, 2), dtype=FTYPE)
            nubar = np.empty((e.size, 2), dtype=FTYPE)
            nu[:, 0] = calculate_2d_flux_weights(e, cz, self.flux_table["nue"])
            nu[:, 1] = calculate_2d_flux_weights(e, cz, self.flux_table["numu"])
            nubar[:, 0] = calculate_2d_flux_weights(
                e, cz, self.flux_table["nuebar"]
            )
            nubar[:, 1] = calculate_2d_flux_weights(
                e, cz, self.flux_table["numubar"]
            )
            container["nu_flux_nominal"] = nu
            container["nubar_flux_nominal"] = nubar
            container.mark_changed("nu_flux_nominal")
            container.mark_changed("nubar_flux_nominal")

        self.data.unlink_containers()


def init_test(**param_kwargs):
    """Instantiation example."""
    param_set = ParamSet(
        [
            Param(
                name="flux_table",
                value="flux/honda-2015-spl-solmin-aa.d",
                **param_kwargs,
            )
        ]
    )
    return honda_ip(params=param_set)
