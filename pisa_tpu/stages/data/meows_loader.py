"""
MEOWS HDF5 event loader (cf. reference
``pisa/stages/data/meows_loader.py``): loads the MEOWS-format MC (flat HDF5
datasets, PrimaryType PDG selection) into containers with OneWeight-derived
effective areas.
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE
from pisa_tpu.core.container import Container
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.hdf import from_hdf
from pisa_tpu.utils.log import logging
from pisa_tpu.utils.resources import find_resource

__all__ = ["meows_loader", "init_test"]


class meows_loader(Stage):  # noqa: N801
    """Parameters: events_file (hdf5), n_files, output_names."""

    def __init__(self, events_file, n_files, output_names, **std_kwargs):
        self.events_file = events_file
        self.n_files = int(n_files)
        self.output_names = output_names
        super().__init__(
            expected_params=(),
            expected_container_keys=(),
            **std_kwargs,
        )

    def setup_function(self):
        logging.debug("Loading MEOWS data...")
        raw = from_hdf(find_resource(self.events_file))

        for name in self.output_names:
            container = Container(name, representation="events")
            nubar = -1 if "bar" in name else 1
            if "e" in name:
                flav = 0
            if "mu" in name:
                flav = 1
            if "tau" in name:
                flav = 2
            pdg = nubar * (12 + 2 * flav)

            mask = np.asarray(raw["PrimaryType"]) == pdg

            container["weighted_aeff"] = (
                np.asarray(raw["oneweight"])[mask].astype(FTYPE)
                * 1e-4
                / (98000 / 5.0)
            )
            n = int(mask.sum())
            container["weights"] = np.ones(n, dtype=FTYPE)
            container["initial_weights"] = np.ones(n, dtype=FTYPE)
            container["total_column_depth"] = np.asarray(
                raw["TotalColumnDepth"]
            )[mask].astype(FTYPE)
            container["true_bjorkenx"] = np.asarray(raw["FinalStateX"])[
                mask
            ].astype(FTYPE)
            container["true_bjorkeny"] = np.asarray(raw["FinalStateY"])[
                mask
            ].astype(FTYPE)
            container["true_energy"] = np.asarray(raw["NuEnergy"])[
                mask
            ].astype(FTYPE)
            container["true_coszen"] = np.cos(
                np.asarray(raw["NuZenith"])[mask].astype(FTYPE)
            )
            container["reco_energy"] = np.asarray(raw["MuExEnergy"])[
                mask
            ].astype(FTYPE)
            container["reco_coszen"] = np.cos(
                np.asarray(raw["MuExZenith"])[mask].astype(FTYPE)
            )
            container["pid"] = np.asarray(raw["pid"])[mask].astype(FTYPE)
            container.set_aux_data("nubar", nubar)
            container.set_aux_data("flav", flav)
            self.data.add_container(container)

    def apply_function(self):
        for container in self.data:
            container["weights"] = container["initial_weights"] * 1.0
            container["astro_weights"] = container["initial_weights"] * 1.0


def init_test(**param_kwargs):
    """Instantiation example (synthetic MEOWS file built on the fly)."""
    import os

    from pisa_tpu import CACHE_DIR
    from pisa_tpu.utils.hdf import to_hdf

    keys = [
        "oneweight", "TotalColumnDepth", "FinalStateX", "FinalStateY",
        "NuEnergy", "NuZenith", "MuExEnergy", "MuExZenith", "pid",
    ]
    rng = np.random.RandomState(0)
    n = 48
    raw = {k: rng.random(n).astype(FTYPE) for k in keys}
    raw["PrimaryType"] = np.array([-12, 14, 12, 16, -14, -16] * 8)
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, "meows_loader_test_file.hdf5")
    to_hdf(raw, path)
    return meows_loader(
        events_file=path, n_files=2024, output_names=["nue", "nutau_bar"]
    )
