"""
Apply hypersurface (discrete detector systematics) corrections
(cf. reference ``pisa/stages/discr_sys/hypersurfaces.py:42``).

The per-bin scale factors are evaluated with pure jnp
(:meth:`pisa_tpu.utils.hypersurface.Hypersurface.evaluate`), so they trace
into compiled templates and the detector-systematics parameters get analytic
gradients.
"""

from __future__ import annotations

import ast
from collections.abc import Mapping

import numpy as np

import jax.numpy as jnp

from pisa_tpu.core.binning import MultiDimBinning
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils import hypersurface as hs
from pisa_tpu.utils.log import logging

__all__ = ["hypersurfaces", "init_test"]


class hypersurfaces(Stage):  # noqa: N801
    """Parameters
    ----------
    fit_results_file : str
        JSON fit results (``utils.hypersurface.save_hypersurfaces``) or the
        official data-release CSV prototype (``.../hyperplanes_*.csv.bz2``).
    propagate_uncertainty : bool
        propagate hypersurface fit uncertainty into 'errors'.
    links : dict or str
        merged-container name -> list of container names.
    """

    def __init__(
        self,
        fit_results_file,
        propagate_uncertainty=False,
        interpolated=False,
        links=None,
        **std_kwargs,
    ):
        self.fit_results_file = fit_results_file
        self.propagate_uncertainty = propagate_uncertainty
        self.interpolated = interpolated
        self.inter_params = []
        if interpolated:
            self.hypersurfaces = hs.load_interpolated_hypersurfaces(
                fit_results_file,
                expected_binning=std_kwargs.get("calc_mode"),
            )
            self.inter_params = list(
                self.hypersurfaces.values()
            )[0].interpolation_param_names
        else:
            self.hypersurfaces = hs.load_hypersurfaces(
                fit_results_file,
                expected_binning=std_kwargs.get("calc_mode"),
            )
        self.hypersurface_param_names = list(
            self.hypersurfaces.values()
        )[0].param_names

        expected_container_keys = ["weights"]
        if std_kwargs.get("error_method"):
            expected_container_keys.append("errors")

        super().__init__(
            expected_params=tuple(
                self.hypersurface_param_names + self.inter_params
            ),
            expected_container_keys=tuple(expected_container_keys),
            supported_reps={"calc_mode": [MultiDimBinning]},
            **std_kwargs,
        )
        if links is None:
            self.links = {}
        elif isinstance(links, Mapping):
            self.links = dict(links)
        else:
            self.links = ast.literal_eval(links)
        self.warning_issued = False

    def setup_function(self):
        for key, val in self.links.items():
            self.data.link_containers(key, val)
        for container in self.data:
            if container.name not in self.hypersurfaces:
                raise ValueError(
                    f"no hypersurface for map {container.name!r}"
                )
            container["hs_scales"] = np.ones(container.size, dtype=np.float64)
            if self.propagate_uncertainty:
                container["hs_scales_uncertainty"] = np.zeros(
                    container.size, dtype=np.float64
                )
        self.data.unlink_containers()

    supports_stacked = True

    def stacked_rate_defer_ok(self):
        # bin-level reweighting is rate-deferral safe; a per-EVENT apply
        # (scales looked up per event) would introduce per-event parameter
        # dependence and must disable deferral
        from pisa_tpu.core.binning import MultiDimBinning

        return isinstance(self.apply_mode, MultiDimBinning)

    def _group_rows(self, cat_names):
        """(group names, rows) for a stacked container: linked groups share
        one hypersurface evaluation (the stacked analog of link_containers);
        unlinked categories get their own by name."""
        group_of = {}
        group_names = []
        for gname, members in self.links.items():
            group_of.update(
                {m: len(group_names) for m in members if m in cat_names}
            )
            group_names.append(gname)
        rows = []
        for name in cat_names:
            if name not in group_of:
                group_of[name] = len(group_names)
                group_names.append(name)
            rows.append(group_of[name])
        return group_names, np.asarray(rows, dtype=np.int32)

    def _compute_stacked(self, container, param_values, osc_params):
        group_names, rows = self._group_rows(container.cat_names)
        scale_rows, unc_rows = [], []
        for gname in group_names:
            if gname not in self.hypersurfaces:
                raise ValueError(f"no hypersurface for map {gname!r}")
            surface = self.hypersurfaces[gname]
            if self.interpolated:
                surface = surface.get_hypersurface(**osc_params)
            if self.propagate_uncertainty:
                scales, unc = surface.evaluate(
                    param_values, return_uncertainty=True
                )
                unc_rows.append(
                    jnp.where(jnp.isfinite(scales), unc, 0.0).ravel()
                )
            else:
                scales = surface.evaluate(param_values)
            scale_rows.append(
                jnp.where(jnp.isfinite(scales), scales, 1.0).ravel()
            )
        container.set_stacked(
            "hs_scales", jnp.stack(scale_rows), rows=rows
        )
        if self.propagate_uncertainty:
            container.set_stacked(
                "hs_scales_uncertainty", jnp.stack(unc_rows), rows=rows
            )

    def compute_function(self):
        for key, val in self.links.items():
            self.data.link_containers(key, val)

        param_values = {
            name: self.params[name].value.magnitude
            for name in self.hypersurface_param_names
        }
        if self.interpolated:
            # interpolation-point params are host-side (static per compute);
            # take concrete magnitudes
            osc_params = {
                name: np.asarray(self.params[name].value.magnitude)
                for name in self.inter_params
            }

        for container in self.data:
            if getattr(container, "is_stacked", False):
                self._compute_stacked(
                    container,
                    param_values,
                    osc_params if self.interpolated else None,
                )
                continue
            surface = self.hypersurfaces[container.name]
            if self.interpolated:
                surface = surface.get_hypersurface(**osc_params)
            if self.propagate_uncertainty:
                scales, unc = surface.evaluate(
                    param_values, return_uncertainty=True
                )
                unc = jnp.where(jnp.isfinite(scales), unc, 0.0)
                container["hs_scales_uncertainty"] = unc
                container.mark_changed("hs_scales_uncertainty")
            else:
                scales = surface.evaluate(param_values)
            # empty bins (non-finite fit) -> scale 1
            scales = jnp.where(jnp.isfinite(scales), scales, 1.0)
            container["hs_scales"] = scales
            container.mark_changed("hs_scales")

        self.data.unlink_containers()

    def apply_function(self):
        for container in self.data:
            # stacked containers: materialize the per-category view of the
            # (G, nbins) group-evaluated scales (one gather)
            if getattr(container, "is_stacked", False):
                scales = container.expanded("hs_scales")
                unc = (
                    container.expanded("hs_scales_uncertainty")
                    if self.propagate_uncertainty
                    else None
                )
            else:
                scales = container["hs_scales"]
                unc = (
                    container["hs_scales_uncertainty"]
                    if self.propagate_uncertainty
                    else None
                )
            # update uncertainty first, before weights change
            if self.error_method == "sumw2":
                if self.data.representation == "events":
                    logging.trace(
                        "events mode: hypersurface error propagation ignored"
                    )
                elif self.propagate_uncertainty:
                    container["errors"] = container["weights"] * unc
                else:
                    container["errors"] = container["errors"] * scales
                    container.mark_changed("errors")
                if "bin_unc2" in container.keys:
                    container["bin_unc2"] = jnp.clip(
                        container["bin_unc2"] * scales, 0.0, None
                    )
                    container.mark_changed("bin_unc2")
            container["weights"] = jnp.clip(
                container["weights"] * scales, 0.0, None
            )


def init_test(**param_kwargs):
    """Instantiation example."""
    from pisa_tpu import ureg
    from pisa_tpu.core.binning import OneDimBinning

    param_set = ParamSet(
        [
            Param(name="opt_eff_overall", value=1.0, **param_kwargs),
            Param(name="opt_eff_lateral", value=25, **param_kwargs),
            Param(name="opt_eff_headon", value=0.0, **param_kwargs),
            Param(name="ice_scattering", value=0.0, **param_kwargs),
            Param(name="ice_absorption", value=0.0, **param_kwargs),
        ]
    )
    dd_en = OneDimBinning(
        "reco_energy",
        is_log=True,
        bin_edges=[
            5.62341325, 7.49894209, 10.0, 13.33521432, 17.7827941,
            23.71373706, 31.6227766, 42.16965034, 56.23413252,
        ] * ureg.GeV,
    )
    dd_cz = OneDimBinning(
        "reco_coszen", num_bins=8, is_lin=True, domain=[-1, 1]
    )
    dd_pid = OneDimBinning("pid", bin_edges=[-0.5, 0.5, 1.5])
    return hypersurfaces(
        params=param_set,
        fit_results_file="events/IceCube_3y_oscillations/hyperplanes_*.csv.bz2",
        error_method="sumw2",
        calc_mode=MultiDimBinning(
            [dd_en, dd_cz, dd_pid], name="dragon_datarelease"
        ),
        # links matching the smoke-test containers (cf. reference's note in
        # its init_test about needing to know the test harness containers)
        links={
            "nutau_cc+nutaubar_cc": ["nutau_cc"],
            "nu_nc+nubar_nc": ["numubar_nc"],
        },
    )
