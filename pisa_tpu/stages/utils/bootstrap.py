"""
Bootstrap resampling stage (cf. reference ``pisa/stages/utils/bootstrap.py``):
resample-with-replacement encoded as per-event multiplicity weights
(an event drawn twice gets weight 2), seeded and regenerated at setup.
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.log import logging

__all__ = ["bootstrap", "init_test"]


class bootstrap(Stage):  # noqa: N801
    """Parameters: seed (int, optional)."""

    def __init__(self, seed=None, **std_kwargs):
        super().__init__(
            expected_params=(),
            expected_container_keys=("weights",),
            supported_reps={"calc_mode": ["events"]},
            **std_kwargs,
        )
        self.seed = None if seed is None else int(seed)

    def setup_function(self):
        logging.debug("Setting up bootstrap with seed: %s", self.seed)
        rng = np.random.default_rng(self.seed)
        for container in self.data:
            n = container.size
            idx = rng.integers(n, size=n)
            container["bootstrap_weights"] = np.bincount(
                idx, minlength=n
            ).astype(FTYPE)

    def apply_function(self):
        for container in self.data:
            container["weights"] = (
                container["weights"] * container["bootstrap_weights"]
            )


def init_test(**param_kwargs):
    """Instantiation example."""
    return bootstrap(calc_mode="events")
