"""
Ad-hoc data/MC agreement correction (cf. reference
``pisa/stages/utils/adhoc_sys.py``): per-variable scale factors from a JSON
file holding a 1-D binning and an array of factors, applied per event via
the binned representation.
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE
from pisa_tpu.core.binning import MultiDimBinning
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.fileio import from_file
from pisa_tpu.utils.log import logging
from pisa_tpu.utils.resources import find_resource

__all__ = ["adhoc_sys", "init_test"]


class adhoc_sys(Stage):  # noqa: N801
    """Parameters: variable_name, scale_file."""

    def __init__(self, variable_name=None, scale_file=None, **std_kwargs):
        super().__init__(
            expected_params=(),
            expected_container_keys=("weights", variable_name),
            supported_reps={
                "calc_mode": ["events"],
                "apply_mode": ["events"],
            },
            **std_kwargs,
        )
        self.variable = variable_name
        self.scale_file = scale_file

    def setup_function(self):
        path = find_resource(self.scale_file)
        logging.info("Loading scaling factors from: %s", path)
        scaling_dict = from_file(path)
        entry = scaling_dict[self.variable]
        binning = entry["binning"]
        if isinstance(binning, dict):
            binning = MultiDimBinning.from_state(binning)
        factors = np.asarray(entry["scales"], dtype=FTYPE)

        self.data.representation = binning
        for container in self.data:
            container["adhoc_scale_factors"] = factors

    def apply_function(self):
        for container in self.data:
            container["weights"] = (
                container["weights"] * container["adhoc_scale_factors"]
            )


def init_test(**param_kwargs):
    """Instantiation example."""
    import os

    from pisa_tpu import CACHE_DIR
    from pisa_tpu.core.binning import OneDimBinning
    from pisa_tpu.utils.fileio import to_file

    var = "reco_length"
    binning = MultiDimBinning(
        [OneDimBinning(var, bin_edges=[0, 0.5, 1.0], is_lin=True)],
        name="adhoc_sys_test_binning",
    )
    scales = np.random.RandomState(0).random(2).astype(FTYPE)
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, "test_scale_file.json")
    to_file({var: {"binning": binning.state, "scales": scales}}, path)
    return adhoc_sys(
        variable_name=var, scale_file=path,
        calc_mode="events", apply_mode="events",
    )
