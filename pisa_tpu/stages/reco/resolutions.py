"""
Resolution-improvement study stage (cf. reference
``pisa/stages/reco/resolutions.py``): scales reco-truth residuals down by a
given fraction at setup.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage

__all__ = ["resolutions", "init_test"]


class resolutions(Stage):  # noqa: N801
    """Params: energy_improvement, coszen_improvement, pid_improvement."""

    def __init__(self, relative_pid=False, **std_kwargs):
        super().__init__(
            expected_params=(
                "energy_improvement",
                "coszen_improvement",
                "pid_improvement",
            ),
            expected_container_keys=(
                "true_energy", "true_coszen", "reco_energy", "reco_coszen",
                "pid",
            ),
            supported_reps={"calc_mode": ["events"]},
            **std_kwargs,
        )
        self.relative_pid = relative_pid

    def setup_function(self):
        e_imp = self.params.energy_improvement.m_as("dimensionless")
        cz_imp = self.params.coszen_improvement.m_as("dimensionless")
        pid_imp = self.params.pid_improvement.m_as("dimensionless")

        for container in self.data:
            container["reco_energy"] = container["reco_energy"] + (
                container["true_energy"] - container["reco_energy"]
            ) * e_imp
            container.mark_changed("reco_energy")

            container["reco_coszen"] = jnp.clip(
                container["reco_coszen"]
                + (container["true_coszen"] - container["reco_coszen"])
                * cz_imp,
                -1,
                1,
            )
            container.mark_changed("reco_coszen")

            # track-like (numu CC) events shift up, others down
            if container.name in ("numu_cc", "numubar_cc"):
                if self.relative_pid:
                    pid = container["pid"] + (1 - container["pid"]) * pid_imp
                else:
                    pid = container["pid"] + pid_imp
            else:
                if self.relative_pid:
                    pid = container["pid"] + (0 - container["pid"]) * pid_imp
                else:
                    pid = container["pid"] - pid_imp
            container["pid"] = pid
            container.mark_changed("pid")


def init_test(**param_kwargs):
    """Instantiation example."""
    param_set = ParamSet(
        [
            Param(name="energy_improvement", value=0.9, **param_kwargs),
            Param(name="coszen_improvement", value=0.5, **param_kwargs),
            Param(name="pid_improvement", value=0.02, **param_kwargs),
        ]
    )
    return resolutions(params=param_set)
