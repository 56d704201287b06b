"""
Observed-data counts from a data-release CSV into one binned container
(cf. reference ``pisa/stages/data/csv_data_hist.py``). Each row is a bin
(count at reco_energy/reco_coszen/pid bin centers); counts become 'weights'
to be histogrammed onto the output binning by utils.hist.
"""

from __future__ import annotations

import pandas as pd

from pisa_tpu import FTYPE
from pisa_tpu.core.container import Container
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.resources import find_resource

__all__ = ["csv_data_hist", "init_test"]


class csv_data_hist(Stage):  # noqa: N801
    """Parameters: events_file (csv path). Implements no apply."""

    def __init__(self, events_file, **std_kwargs):
        self.events_file = find_resource(events_file)
        super().__init__(
            expected_params=(),
            expected_container_keys=(),
            **std_kwargs,
        )

    def setup_function(self):
        events = pd.read_csv(self.events_file)

        container = Container("total", representation="events")
        container["weights"] = events["count"].values.astype(FTYPE)
        container["reco_energy"] = events["reco_energy"].values.astype(FTYPE)
        container["reco_coszen"] = events["reco_coszen"].values.astype(FTYPE)
        container["pid"] = events["pid"].values.astype(FTYPE)
        self.data.add_container(container)


def init_test(**param_kwargs):
    """Instantiation example."""
    return csv_data_hist(
        events_file="events/IceCube_3y_oscillations/data.csv.bz2"
    )
