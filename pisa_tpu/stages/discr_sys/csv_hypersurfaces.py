"""
Hypersurfaces from CSV files with linear interpolation across an
oscillation parameter (cf. reference
``pisa/stages/discr_sys/csv_hypersurfaces.py``): each CSV holds one linear
hypersurface per bin *per value of the interpolation parameter*
(e.g. dm31); the stage linearly interpolates intercept and slopes to the
current value, then evaluates ``intercept + sum slope_p (p - nominal_p)``
with fused jnp (traceable, so all systematics keep analytic gradients).
"""

from __future__ import annotations

import ast
import os
from collections.abc import Mapping

import numpy as np
import pandas as pd

import jax.numpy as jnp

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.binning import MultiDimBinning
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.log import logging
from pisa_tpu.utils.resources import find_resource

__all__ = ["csv_hypersurfaces", "init_test"]


class csv_hypersurfaces(Stage):  # noqa: N801
    """Parameters: fit_results_file(s), nominal_systematics (dict),
    inter_param (str), links, propagate_uncertainty."""

    def __init__(
        self,
        fit_results_file,
        nominal_systematics,
        inter_param,
        links=None,
        propagate_uncertainty=True,
        **std_kwargs,
    ):
        if isinstance(fit_results_file, str):
            fit_results_file = [
                s.strip() for s in fit_results_file.split(",")
            ]
        self.fit_results_file = fit_results_file
        if isinstance(nominal_systematics, str):
            nominal_systematics = ast.literal_eval(nominal_systematics)
        self.nominal_systematics = dict(nominal_systematics)
        self.inter_param = inter_param
        self.propagate_uncertainty = propagate_uncertainty
        self.hs = {}

        expected_container_keys = ["weights"]
        if std_kwargs.get("error_method"):
            expected_container_keys.append("errors")

        super().__init__(
            expected_params=tuple(
                list(self.nominal_systematics.keys()) + [inter_param]
            ),
            expected_container_keys=tuple(expected_container_keys),
            supported_reps={
                "calc_mode": [MultiDimBinning],
                "apply_mode": [MultiDimBinning, "events"],
            },
            **std_kwargs,
        )
        if links is None:
            self.links = {}
        elif isinstance(links, Mapping):
            self.links = dict(links)
        else:
            self.links = ast.literal_eval(links)

    def setup_function(self):
        for f in self.fit_results_file:
            k = os.path.splitext(os.path.basename(f))[0]
            if k.endswith(".csv"):  # e.g. .csv.bz2 double extension
                k = os.path.splitext(k)[0]
            if k.startswith("hs_"):
                k = k[3:]
            if k in self.hs:
                raise ValueError(f"{k} already exists in the HS dict")
            self.hs[k] = pd.read_csv(find_resource(f))

        for key, val in self.links.items():
            self.data.link_containers(key, val)

        for container in self.data:
            if container.name not in self.hs:
                raise ValueError(
                    f"no hypersurface for {container.name!r}; have"
                    f" {list(self.hs)}"
                )
            container["hs_scales"] = np.ones(container.size, dtype=FTYPE)
            if self.propagate_uncertainty:
                hs = self.hs[container.name]
                val = self.params[self.inter_param].value.magnitude
                start = int(np.argmin(np.abs(hs[self.inter_param] - val)))
                _, counts = np.unique(
                    hs[self.inter_param], return_counts=True
                )
                stop = start + counts[0]
                container["hs_scales_uncertainty"] = (
                    hs["intercept_sigma"][start:stop]
                    .to_numpy()
                    .reshape(container.size)
                    .astype(FTYPE)
                )
        self.data.unlink_containers()

    def compute_function(self):
        for key, val in self.links.items():
            self.data.link_containers(key, val)

        param_values = {
            name: self.params[name].value.magnitude
            for name in self.nominal_systematics
        }
        x = self.params[self.inter_param].value.magnitude

        for container in self.data:
            hs = self.hs[container.name]
            grid = hs[self.inter_param].to_numpy()
            uniq = np.unique(grid)
            if not (uniq.min() <= float(np.asarray(x)) <= uniq.max()):
                raise ValueError(
                    f"{self.inter_param} = {x} outside interpolation range"
                )
            xv = float(np.asarray(x))
            lower = uniq[uniq <= xv].max()
            upper_cands = uniq[uniq > xv]
            upper = upper_cands.min() if upper_cands.size else lower

            def coeffs(value, col):
                return (
                    hs.loc[grid == value, col]
                    .to_numpy()
                    .astype(np.float64)
                )

            scales = 0.0
            for col in ["intercept"] + list(param_values.keys()):
                c_lo = coeffs(lower, col)
                if upper == lower:
                    c = jnp.asarray(c_lo)
                else:
                    c_hi = coeffs(upper, col)
                    frac = (x - lower) / (upper - lower)
                    c = jnp.asarray(c_lo) + frac * jnp.asarray(c_hi - c_lo)
                if col == "intercept":
                    scales = scales + c
                else:
                    scales = scales + c * (
                        param_values[col] - self.nominal_systematics[col]
                    )

            scales = jnp.where(jnp.isfinite(scales), scales, 1.0)
            container["hs_scales"] = scales.reshape(container.size)
            container.mark_changed("hs_scales")

        self.data.unlink_containers()

    def apply_function(self):
        for container in self.data:
            if self.error_method == "sumw2":
                if self.data.representation == "events":
                    logging.warning(
                        "events mode: hypersurface error propagation ignored"
                    )
                elif self.propagate_uncertainty:
                    container["errors"] = (
                        container["weights"]
                        * container["hs_scales_uncertainty"]
                    )
                else:
                    container["errors"] = (
                        container["errors"] * container["hs_scales"]
                    )
                container.mark_changed("errors")
                if "bin_unc2" in container.keys:
                    container["bin_unc2"] = jnp.clip(
                        container["bin_unc2"] * container["hs_scales"],
                        0.0, None,
                    )
                    container.mark_changed("bin_unc2")
            container["weights"] = jnp.clip(
                container["weights"] * container["hs_scales"], 0.0, None
            )


def init_test(**param_kwargs):
    """Instantiation example."""
    from pisa_tpu.core.binning import OneDimBinning

    param_kwargs.pop("range", None)
    param_set = ParamSet(
        [
            Param(name="dom_eff", value=1.0, **param_kwargs),
            Param(name="hole_ice_p0", value=0.1, **param_kwargs),
            Param(name="hole_ice_p1", value=-0.05, **param_kwargs),
            Param(name="bulk_ice_scatter", value=1.05, **param_kwargs),
            Param(name="bulk_ice_abs", value=1.0, **param_kwargs),
            Param(
                name="dm31", value=3e-3 * ureg.eV**2,
                range=[1e-3, 7e-3] * ureg.eV**2, **param_kwargs,
            ),
        ]
    )
    nominal = {
        "dom_eff": 1.00, "hole_ice_p0": 0.10, "hole_ice_p1": -0.05,
        "bulk_ice_abs": 1.00, "bulk_ice_scatter": 1.00,
    }
    dd_en = OneDimBinning(
        "reco_energy", is_log=True,
        bin_edges=[
            6.31, 8.46, 11.34, 15.20, 20.38, 27.31, 36.61, 49.08, 65.79,
            88.20, 158.49,
        ] * ureg.GeV,
    )
    dd_cz = OneDimBinning(
        "reco_coszen", num_bins=10, is_lin=True, domain=[-1, 0.1]
    )
    dd_pid = OneDimBinning("pid", bin_edges=[0.55, 0.75, 1.0])
    binning = MultiDimBinning(
        [dd_en, dd_cz, dd_pid], name="oscNext_verification"
    )
    return csv_hypersurfaces(
        fit_results_file="events/hs_test.csv",
        nominal_systematics=nominal,
        inter_param="dm31",
        links={"test": ["nutau_cc", "numubar_nc"]},
        params=param_set,
        calc_mode=binning,
        apply_mode=binning,
    )
