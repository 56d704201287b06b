"""
Continuous detector systematics from SnowStorm ensembles (cf. reference
``pisa/stages/cont_sys/snowstorm_hist.py``): split the simulation by each
sampled systematic value about its central value, histogram both halves,
and derive a per-bin linear relative gradient; the per-bin scale is
``prod_s 1 + (p_s - central_s) * grad_s``.

Gradient histograms are host-side precompute (cached, invalidated when
`additional_params` move beyond their tolerances); the scale application is
fused jnp so the systematic params remain differentiable.
"""

from __future__ import annotations

import ast

import numpy as np

import jax.numpy as jnp

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.binning import MultiDimBinning
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.core.translation import histogram

__all__ = ["snowstorm_hist", "init_test"]


def _parse(v, default=None):
    if isinstance(v, str):
        return ast.literal_eval(v)
    return default if v is None else v


class snowstorm_hist(Stage):  # noqa: N801
    """Parameters: systematics, simulation_dists ('gauss'/'uniform'),
    simulation_dists_params ((mean, std) / (min, max)), additional_params,
    tolerances."""

    def __init__(
        self,
        systematics,
        simulation_dists,
        simulation_dists_params,
        additional_params=None,
        tolerances=None,
        **std_kwargs,
    ):
        self.systematics = list(_parse(systematics))
        self.simulation_dists = list(_parse(simulation_dists))
        self.simulation_dists_params = list(_parse(simulation_dists_params))
        self.additional_params = list(_parse(additional_params, []))
        tol = _parse(tolerances, [0] * len(self.additional_params))
        self.tol = np.asarray(tol, dtype=FTYPE)
        if len(self.simulation_dists) != len(self.systematics):
            raise ValueError("one simulation_dist per systematic required")
        for sd in self.simulation_dists:
            if sd.lower() not in ("gauss", "uniform"):
                raise ValueError(f"unknown simulation dist {sd!r}")

        self.grads = {}
        self.central_values = []
        self.additional_params_values = None

        super().__init__(
            expected_params=tuple(
                self.systematics + self.additional_params
            ),
            expected_container_keys=tuple(["weights"] + self.systematics),
            supported_reps={
                "calc_mode": ["events"],
                "apply_mode": [None, MultiDimBinning],
            },
            **std_kwargs,
        )

    def setup_function(self):
        if self.apply_mode is None:
            self.apply_mode = self.data["output_binning"]

        self.central_values = []
        for sd, sp in zip(self.simulation_dists, self.simulation_dists_params):
            if sd.lower() == "gauss":
                self.central_values.append(sp[0])
            else:
                self.central_values.append(sum(sp) / 2)

        for container in self.data:
            self.grads[container.name] = {}
        self.additional_params_values = None

    def _calc_gradients(self, container):
        container.representation = "events"
        sample = [
            np.asarray(container[d.name]) for d in self.apply_mode
        ]
        weights = np.asarray(container["weights"])
        grads = {}
        for i, sys in enumerate(self.systematics):
            vals = np.asarray(container[sys])
            above = vals > self.central_values[i]
            below = vals < self.central_values[i]
            h1 = np.asarray(
                histogram(
                    [s[above] for s in sample], weights[above],
                    self.apply_mode, averaged=False,
                )
            )
            h2 = np.asarray(
                histogram(
                    [s[below] for s in sample], weights[below],
                    self.apply_mode, averaged=False,
                )
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                if self.simulation_dists[i].lower() == "gauss":
                    # eq. 2.12 of the SnowStorm paper correction factor
                    corr = (
                        1.0 / self.simulation_dists_params[i][1]
                    ) * np.sqrt(np.pi / 2)
                    g = 2 * (h1 - h2) * corr / (h1 + h2)
                else:
                    diff = (
                        self.simulation_dists_params[i][1]
                        - self.simulation_dists_params[i][0]
                    ) / 2
                    g = 2 * (h1 - h2) / diff / (h1 + h2)
            grads[sys] = np.nan_to_num(g).ravel().astype(FTYPE)
        return grads

    def compute_function(self):
        vals = np.array(
            [self.params[p].value.magnitude for p in self.additional_params],
            dtype=FTYPE,
        )
        if self.additional_params_values is None or np.any(
            np.abs(vals - self.additional_params_values) > self.tol
        ):
            calc_grads = True
            self.additional_params_values = vals
        else:
            calc_grads = False

        for container in self.data:
            if calc_grads or not self.grads[container.name]:
                self.grads[container.name] = self._calc_gradients(container)

            container.representation = self.apply_mode
            scale = jnp.ones(self.apply_mode.size)
            for i, sys in enumerate(self.systematics):
                shift = (
                    self.params[sys].value.magnitude
                    - self.central_values[i]
                )
                scale = scale * (
                    1.0 + shift * jnp.asarray(self.grads[container.name][sys])
                )
            container["syst_scale"] = jnp.clip(scale, 0.0, None)
            container.mark_changed("syst_scale")

    def apply_function(self):
        for container in self.data:
            container["weights"] = (
                container["weights"] * container["syst_scale"]
            )


def init_test(**param_kwargs):
    """Instantiation example."""
    param_kwargs.pop("range", None)
    param_set = ParamSet(
        [
            Param(
                name="dom_eff", value=1.0, range=[0.8, 1.2], **param_kwargs
            ),
            Param(
                name="deltam31", value=3e-3 * ureg.eV**2,
                range=[1e-3, 7e-3] * ureg.eV**2, **param_kwargs,
            ),
        ]
    )
    return snowstorm_hist(
        systematics=["dom_eff"],
        simulation_dists=["gauss"],
        simulation_dists_params=[(1.0, 0.1)],
        additional_params=["deltam31"],
        params=param_set,
        calc_mode="events",
    )
