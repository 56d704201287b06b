"""
Pure grid-of-points source (cf. reference ``pisa/stages/data/grid.py``):
one container per output name holding the meshgrid of a binning as "events"
with unit weights — used for oscillograms.
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE
from pisa_tpu.core.container import Container
from pisa_tpu.core.stage import Stage

__all__ = ["grid", "init_test"]


class grid(Stage):  # noqa: N801
    """Parameters: grid_binning (MultiDimBinning), entity, output_names."""

    def __init__(
        self, grid_binning, entity="midpoints", output_names=None,
        **std_kwargs,
    ):
        self.grid_binning = grid_binning
        self.entity = entity
        if output_names is None:
            raise ValueError("output_names must be given")
        self.output_names = output_names
        super().__init__(
            expected_params=(),
            expected_container_keys=(),
            supported_reps={"calc_mode": ["events"]},
            **std_kwargs,
        )

    def setup_function(self):
        for name in self.output_names:
            container = Container(name, representation="events")
            nubar = -1 if "bar" in name else 1
            if "e" in name:
                flav = 0
            if "mu" in name:
                flav = 1
            if "tau" in name:
                flav = 2

            mesh = self.grid_binning.meshgrid(
                entity=self.entity, attach_units=False
            )
            size = mesh[0].size
            for var_name, var_vals in zip(self.grid_binning.names, mesh):
                container[var_name] = var_vals.ravel().astype(FTYPE)

            container.set_aux_data("nubar", nubar)
            container.set_aux_data("flav", flav)
            container["initial_weights"] = np.ones(size, dtype=FTYPE)
            container["weights"] = np.ones(size, dtype=FTYPE)
            self.data.add_container(container)

    def apply_function(self):
        for container in self.data:
            container["weights"] = container["initial_weights"] * 1.0


def init_test(**param_kwargs):
    """Instantiation example."""
    from pisa_tpu import ureg
    from pisa_tpu.core.binning import MultiDimBinning, OneDimBinning

    binning = MultiDimBinning(
        [
            OneDimBinning(
                "true_energy", num_bins=5, is_log=True,
                domain=[1, 100] * ureg.GeV,
            ),
            OneDimBinning(
                "true_coszen", num_bins=5, is_lin=True, domain=[-1, 1]
            ),
        ],
        name="grid_test",
    )
    return grid(
        grid_binning=binning, output_names=["nue_cc", "numu_cc"],
        calc_mode="events",
    )
