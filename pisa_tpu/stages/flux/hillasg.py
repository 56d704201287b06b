"""
Hillas-Gaisser H3a atmospheric flux (cf. reference
``pisa/stages/flux/hillasg.py``): 2-D (energy, coszen) flux tables including
prompt nutau contributions, evaluated with the integral-preserving scheme.

A generated H3a table IS vendored (``flux/hillas-h3a-taumode.d``, produced
by ``scripts/make_h3a_table.py`` — the analytic pion/kaon/prompt cascade on
the Gaisser-2012 H3a primary spectrum; the reference's own MCEq-produced
table is IceCube-internal and not redistributable), so the stage runs end
to end out of the box; point ``flux_table`` at a real table of the same
"hg_taumode" format for production use.
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

__all__ = ["hillasg", "init_test"]

_ALL_NU = [
    "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
    "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
    "nutaubar_nc",
]


class hillasg(Stage):  # noqa: N801
    """Params: flux_table. Fills 3-flavor (e, mu, tau) nominal fluxes."""

    def __init__(self, **std_kwargs):
        super().__init__(
            expected_params=("flux_table",),
            expected_container_keys=("true_energy", "true_coszen"),
            **std_kwargs,
        )
        self.flux_table = None

    host_param_names = ("flux_table",)

    def setup_function(self):
        self.flux_table = load_2d_table(str(self.params.flux_table.value))
        if self.is_map:
            self.data.link_containers("nu", _ALL_NU)
        for container in self.data:
            container["nu_flux_nominal"] = np.empty(
                (container.size, 3), dtype=FTYPE
            )
            container["nubar_flux_nominal"] = np.empty(
                (container.size, 3), dtype=FTYPE
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
            nu = np.empty((e.size, 3), dtype=FTYPE)
            nubar = np.empty((e.size, 3), dtype=FTYPE)
            for i, (f, fbar) in enumerate(
                (("nue", "nuebar"), ("numu", "numubar"),
                 ("nutau", "nutaubar"))
            ):
                nu[:, i] = calculate_2d_flux_weights(
                    e, cz, self.flux_table[f]
                )
                nubar[:, i] = calculate_2d_flux_weights(
                    e, cz, self.flux_table[fbar]
                )
            container["nu_flux_nominal"] = nu
            container["nubar_flux_nominal"] = nubar
            container.mark_changed("nu_flux_nominal")
            container.mark_changed("nubar_flux_nominal")
        self.data.unlink_containers()


def init_test(**param_kwargs):
    """Instantiation example (vendored generated H3a table)."""
    param_set = ParamSet(
        [
            Param(
                name="flux_table",
                value="flux/hillas-h3a-taumode.d",
                **param_kwargs,
            ),
        ]
    )
    return hillasg(params=param_set, calc_mode="events")
