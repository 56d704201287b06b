"""
Inverted-corridor-cut (atmospheric-muon background) histogram from a
data-release CSV (cf. reference ``pisa/stages/data/csv_icc_hist.py``): each
row is a bin count with an absolute uncertainty; ``weights = count *
atm_muon_scale`` at apply time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pisa_tpu import FTYPE
from pisa_tpu.core.container import Container
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.resources import find_resource

__all__ = ["csv_icc_hist", "init_test"]


class csv_icc_hist(Stage):  # noqa: N801
    """Parameters: events_file; param atm_muon_scale (dimensionless)."""

    def __init__(self, events_file, **std_kwargs):
        self.events_file = find_resource(events_file)
        super().__init__(
            expected_params=("atm_muon_scale",),
            expected_container_keys=(),
            **std_kwargs,
        )

    def setup_function(self):
        events = pd.read_csv(self.events_file)

        container = Container("icc", representation="events")
        container["count"] = events["count"].values.astype(FTYPE)
        container["weights"] = np.ones(container.size, dtype=FTYPE)
        err_col = "abs_uncert" if "abs_uncert" in events else "abs_uncertainty"
        container["errors"] = events[err_col].values.astype(FTYPE)
        container["reco_energy"] = events["reco_energy"].values.astype(FTYPE)
        container["reco_coszen"] = events["reco_coszen"].values.astype(FTYPE)
        container["pid"] = events["pid"].values.astype(FTYPE)
        self.data.add_container(container)

    def apply_function(self):
        scale = self.params.atm_muon_scale.m_as("dimensionless")
        for container in self.data:
            container["weights"] = container["count"] * scale


def init_test(**param_kwargs):
    """Instantiation example."""
    return csv_icc_hist(
        events_file="events/IceCube_3y_oscillations/muons.csv.bz2",
        params=ParamSet(
            [Param(name="atm_muon_scale", value=0.2, **param_kwargs)]
        ),
    )
