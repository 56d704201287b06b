"""
Override binned variances (cf. reference
``pisa/stages/utils/set_variance.py``): manual variance = weights *
variance_scale (optionally scaled by expected/actual MC counts, floored),
errors = sqrt(variance).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pisa_tpu.core.binning import MultiDimBinning
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.log import logging

__all__ = ["set_variance", "init_test"]


class set_variance(Stage):  # noqa: N801
    """Parameters: variance_scale, variance_floor, expected_total_mc,
    divide_total_mc."""

    def __init__(
        self,
        variance_scale=1.0,
        variance_floor=None,
        expected_total_mc=None,
        divide_total_mc=False,
        **std_kwargs,
    ):
        super().__init__(
            expected_params=(),
            expected_container_keys=(),
            supported_reps={
                "calc_mode": [MultiDimBinning],
                "apply_mode": [MultiDimBinning],
            },
            **std_kwargs,
        )
        if variance_scale is None:
            raise ValueError("variance_scale must be given")
        self.variance_scale = float(variance_scale)
        self.variance_floor = (
            None if variance_floor is None else float(variance_floor)
        )
        if expected_total_mc is None:
            raise ValueError("expected_total_mc must be given")
        self.expected_total_mc = int(expected_total_mc)
        self.divide_n = bool(divide_total_mc)
        self.total_mc = {}

    def setup_function(self):
        if self.divide_n:
            self.data.representation = "events"
            for container in self.data:
                self.total_mc[container.name] = container.size
                logging.debug(
                    "%d mc events in container %s",
                    container.size, container.name,
                )
        self.data.representation = self.calc_mode
        for container in self.data:
            container["manual_variance"] = np.empty(
                container.size, dtype=np.float64
            )
            if "errors" not in container.keys:
                container["errors"] = np.zeros(
                    container.size, dtype=np.float64
                )

    def compute_function(self):
        for container in self.data:
            var = container["weights"] * self.variance_scale
            if self.divide_n:
                var = var * (
                    self.expected_total_mc / self.total_mc[container.name]
                )
            if self.variance_floor is not None:
                var = jnp.clip(var, self.variance_floor, None)
            container["manual_variance"] = var
            container.mark_changed("manual_variance")

    def apply_function(self):
        for container in self.data:
            container["errors"] = jnp.sqrt(container["manual_variance"])
            container.mark_changed("errors")


def init_test(**param_kwargs):
    """Instantiation example."""
    from pisa_tpu import ureg
    from pisa_tpu.core.binning import OneDimBinning

    binning = MultiDimBinning(
        [
            OneDimBinning(
                "true_energy", num_bins=5, is_log=True,
                domain=[1, 100] * ureg.GeV,
            )
        ],
        name="test",
    )
    return set_variance(
        expected_total_mc=100, calc_mode=binning, apply_mode=binning
    )
