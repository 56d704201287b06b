"""
Reduced-parameter MCEq/Barr flux systematics (cf. reference
``pisa/stages/flux/mceq_barr_red.py``): like :mod:`flux.mceq_barr` but with
correlated pion-production blocks collapsed into a single 'af' parameter
(8 Barr blocks instead of 13), gradients applied absolutely to an external
(Honda) nominal flux — the reduced-scheme table stores only gradients.
"""

from __future__ import annotations

import pickle
from bz2 import BZ2File
from collections import OrderedDict

import numpy as np

import jax.numpy as jnp

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.param import Param, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.stages.flux.mceq_barr import mceq_barr, spectral_index_scale
from pisa_tpu.utils.log import logging
from pisa_tpu.utils.resources import find_resource

__all__ = ["mceq_barr_red", "init_test"]

_NU_LINK = [
    "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
]
_NUBAR_LINK = [
    "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
    "nutaubar_nc",
]


class mceq_barr_red(Stage):  # noqa: N801
    """Params: pion_ratio, barr_{af,g,h,i}_Pi, barr_{w,x,y,z}_{K,antiK},
    delta_index, energy_pivot."""

    BARR_NAMES = ["af", "g", "h", "i", "w", "x", "y", "z"]
    PION_NAMES = ["af", "g", "h", "i"]
    KAON_NAMES = ["w", "x", "y", "z"]

    def __init__(self, table_file, include_nutau_flux=False, **std_kwargs):
        self.table_file = table_file
        self.include_nutau_flux = include_nutau_flux
        self.gradient_param_names = [
            n + s for n in self.BARR_NAMES for s in ("+", "-")
        ]
        expected_params = (
            "pion_ratio",
            *(f"barr_{n}_Pi" for n in self.PION_NAMES),
            *(f"barr_{n}_K" for n in self.KAON_NAMES),
            *(f"barr_{n}_antiK" for n in self.KAON_NAMES),
            "delta_index",
            "energy_pivot",
        )
        super().__init__(
            expected_params=expected_params,
            expected_container_keys=(
                "true_energy", "true_coszen", "nubar",
                "nu_flux_nominal", "nubar_flux_nominal",
            ),
            **std_kwargs,
        )

    def setup_function(self):
        spline_file = find_resource(self.table_file)
        logging.info("Loading reduced MCEq spline tables from %s", spline_file)
        splines = pickle.load(BZ2File(spline_file), encoding="latin1")
        for name in self.gradient_param_names:
            if name not in splines:
                raise ValueError(f"gradient param {name!r} missing from table")

        n_flavs = 3 if self.include_nutau_flux else 2
        if self.is_map:
            self.data.link_containers("nu", _NU_LINK)
            self.data.link_containers("nubar", _NUBAR_LINK)

        for container in self.data:
            log_e = np.log(np.asarray(container["true_energy"], np.float64))
            abs_cz = np.abs(np.asarray(container["true_coszen"], np.float64))
            sfx = "" if int(container["nubar"]) > 0 else "bar"
            flavs = ["nue", "numu", "nutau"][:n_flavs]
            grads = np.stack(
                [
                    np.stack(
                        [
                            splines[g][f"d{f}{sfx}"](
                                abs_cz, log_e, grid=False
                            )
                            for f in flavs
                        ],
                        axis=1,
                    )
                    for g in self.gradient_param_names
                ],
                axis=2,
            ).astype(FTYPE)
            container["gradients"] = grads
            container.mark_changed("gradients")
        self.data.unlink_containers()

    def _gradient_param_vector(self):
        p = self.params
        pion_ratio = p.pion_ratio.m_as("dimensionless")
        mapping = OrderedDict()
        for n in self.PION_NAMES:
            plus = p[f"barr_{n}_Pi"].m_as("dimensionless")
            mapping[n + "+"] = plus
            mapping[n + "-"] = mceq_barr.antipion_production(plus, pion_ratio)
        for n in self.KAON_NAMES:
            mapping[n + "+"] = p[f"barr_{n}_K"].m_as("dimensionless")
            mapping[n + "-"] = p[f"barr_{n}_antiK"].m_as("dimensionless")
        return jnp.stack(
            [mapping[k] * jnp.ones(()) for k in self.gradient_param_names]
        )

    def compute_function(self):
        if self.is_map:
            self.data.link_containers("nu", _NU_LINK)
            self.data.link_containers("nubar", _NUBAR_LINK)

        delta_index = self.params.delta_index.m_as("dimensionless")
        energy_pivot = self.params.energy_pivot.m_as("GeV")
        gparams = self._gradient_param_vector()

        for container in self.data:
            key = (
                "nu_flux_nominal"
                if int(container["nubar"]) > 0
                else "nubar_flux_nominal"
            )
            grads = jnp.asarray(container["gradients"])
            n_flavs = grads.shape[1]
            nominal = jnp.asarray(container[key])[:, :n_flavs]
            scale = spectral_index_scale(
                jnp.asarray(container["true_energy"]), energy_pivot,
                delta_index,
            )[:, None]
            flux = nominal * scale + jnp.einsum("afc,c->af", grads, gparams)
            container["nu_flux"] = jnp.clip(flux, 0.0, None)
            container.mark_changed("nu_flux")
        self.data.unlink_containers()


def init_test(**param_kwargs):
    """Instantiation example."""
    params = [Param(name="pion_ratio", value=0.0, **param_kwargs)]
    params += [
        Param(name=f"barr_{n}_Pi", value=0.0, **param_kwargs)
        for n in mceq_barr_red.PION_NAMES
    ]
    params += [
        Param(name=f"barr_{n}_K", value=0.0, **param_kwargs)
        for n in mceq_barr_red.KAON_NAMES
    ]
    params += [
        Param(name=f"barr_{n}_antiK", value=0.0, **param_kwargs)
        for n in mceq_barr_red.KAON_NAMES
    ]
    params += [
        Param(name="delta_index", value=0.0, **param_kwargs),
        Param(name="energy_pivot", value=25 * ureg.GeV, **param_kwargs),
    ]
    return mceq_barr_red(
        table_file=(
            "flux/MCEq_flux_gradient_splines_2212_GlobalSplineFitBeta"
            "_SIBYLL23C_reduced_scheme.pckl.bz2"
        ),
        params=ParamSet(params),
    )
