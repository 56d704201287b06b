"""
MCEq-computed nominal flux + Barr-gradient flux systematics (cf. reference
``pisa/stages/flux/mceq_barr.py``): the flux is the (spectrally tilted)
nominal flux plus per-event MCEq gradients times 18 Barr parameters
(9 pion params with pi- tied to pi+ via the pion ratio; 8 kaon params).

Setup is host-side scipy spline evaluation (splines are host data; the flux
and gradient arrays become compile-time constants), while the compute
(parameter-dependent weighting) is fused jnp — so Barr params get analytic
gradients through compiled templates.
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
from pisa_tpu.utils.log import logging
from pisa_tpu.utils.resources import find_resource

__all__ = ["mceq_barr", "spectral_index_scale", "init_test"]

_NU_LINK = [
    "nue_cc", "numu_cc", "nutau_cc", "nue_nc", "numu_nc", "nutau_nc",
]
_NUBAR_LINK = [
    "nuebar_cc", "numubar_cc", "nutaubar_cc", "nuebar_nc", "numubar_nc",
    "nutaubar_nc",
]


def spectral_index_scale(true_energy, energy_pivot, delta_index):
    """(E/E_pivot)^delta_index."""
    return jnp.power(true_energy / energy_pivot, delta_index)


class mceq_barr(Stage):  # noqa: N801
    """Parameters: table_file, include_nutau_flux, use_honda_nominal_flux,
    use_relative_gradients; params as in the reference."""

    BARR_NAMES = ["a", "b", "c", "d", "e", "f", "g", "h", "i",  # pions
                  "w", "x", "y", "z"]  # kaons

    def __init__(
        self,
        table_file,
        include_nutau_flux=False,
        use_honda_nominal_flux=True,
        use_relative_gradients=True,
        **std_kwargs,
    ):
        self.table_file = table_file
        self.include_nutau_flux = include_nutau_flux
        self.use_honda_nominal_flux = use_honda_nominal_flux
        self.use_relative_gradients = use_relative_gradients

        self.gradient_param_names = [
            n + s for n in self.BARR_NAMES for s in ("+", "-")
        ]

        expected_params = (
            "pion_ratio",
            *(f"barr_{n}_Pi" for n in self.BARR_NAMES[:9]),
            *(f"barr_{n}_K" for n in self.BARR_NAMES[9:]),
            *(f"barr_{n}_antiK" for n in self.BARR_NAMES[9:]),
            "delta_index",
            "energy_pivot",
        )
        expected_container_keys = ["true_energy", "true_coszen", "nubar"]
        if use_honda_nominal_flux:
            expected_container_keys += ["nu_flux_nominal", "nubar_flux_nominal"]

        super().__init__(
            expected_params=expected_params,
            expected_container_keys=tuple(expected_container_keys),
            **std_kwargs,
        )

    host_param_names = ()

    def setup_function(self):
        spline_file = find_resource(self.table_file)
        logging.info("Loading MCEq spline tables from %s", spline_file)
        splines = pickle.load(BZ2File(spline_file), encoding="latin1")
        for name in self.gradient_param_names:
            if name not in splines:
                raise ValueError(f"gradient param {name!r} missing from table")

        n_flavs = 3 if self.include_nutau_flux else 2
        n_grads = len(self.gradient_param_names)

        if self.is_map:
            self.data.link_containers("nu", _NU_LINK)
            self.data.link_containers("nubar", _NUBAR_LINK)

        for container in self.data:
            log_e = np.log(np.asarray(container["true_energy"], np.float64))
            abs_cz = np.abs(np.asarray(container["true_coszen"], np.float64))
            nubar = int(container["nubar"])
            sfx = "" if nubar > 0 else "bar"
            flavs = ["nue", "numu", "nutau"][:n_flavs]

            arb = self.gradient_param_names[0]
            mceq = np.stack(
                [
                    splines[arb][f"{f}{sfx}"](abs_cz, log_e, grid=False)
                    for f in flavs
                ],
                axis=1,
            ).astype(FTYPE)
            container["nu_flux_mceq"] = mceq
            if not self.use_honda_nominal_flux:
                container["nu_flux_nominal"] = mceq.copy()

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
            ).astype(FTYPE)  # (N, n_flavs, n_grads)
            container["gradients"] = grads
            container.mark_changed("nu_flux_mceq")
            container.mark_changed("gradients")

        self.data.unlink_containers()

    @staticmethod
    def antipion_production(barr_var, pion_ratio):
        """pi- Barr param from pi+ param and the (delta) pion ratio
        (cf. reference ``mceq_barr.py:antipion_production``)."""
        return (1 + barr_var) / (1 + pion_ratio) - 1

    def _gradient_param_vector(self):
        p = self.params
        pion_ratio = p.pion_ratio.m_as("dimensionless")
        mapping = OrderedDict()
        for n in self.BARR_NAMES[:9]:
            plus = p[f"barr_{n}_Pi"].m_as("dimensionless")
            mapping[n + "+"] = plus
            mapping[n + "-"] = self.antipion_production(plus, pion_ratio)
        for n in self.BARR_NAMES[9:]:
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
            if self.use_honda_nominal_flux:
                key = (
                    "nu_flux_nominal"
                    if int(container["nubar"]) > 0
                    else "nubar_flux_nominal"
                )
            else:
                key = "nu_flux_nominal"
            nominal = jnp.asarray(container[key])
            grads = jnp.asarray(container["gradients"])
            n_flavs = grads.shape[1]
            nominal = nominal[:, :n_flavs]

            scale = spectral_index_scale(
                jnp.asarray(container["true_energy"]), energy_pivot,
                delta_index,
            )[:, None]
            base = nominal * scale

            if self.use_relative_gradients:
                mceq = jnp.asarray(container["nu_flux_mceq"])[:, :n_flavs]
                rel = grads / (mceq * scale)[..., None]
                contribution = base[..., None] * rel
            else:
                contribution = grads
            flux = base + jnp.einsum("afc,c->af", contribution, gparams)
            container["nu_flux"] = jnp.clip(flux, 0.0, None)
            container.mark_changed("nu_flux")

        self.data.unlink_containers()


def init_test(**param_kwargs):
    """Instantiation example."""
    names = mceq_barr.BARR_NAMES
    params = [Param(name="pion_ratio", value=0.0, **param_kwargs)]
    params += [
        Param(name=f"barr_{n}_Pi", value=0.0, **param_kwargs)
        for n in names[:9]
    ]
    params += [
        Param(name=f"barr_{n}_K", value=0.0, **param_kwargs)
        for n in names[9:]
    ]
    params += [
        Param(name=f"barr_{n}_antiK", value=0.0, **param_kwargs)
        for n in names[9:]
    ]
    params += [
        Param(name="delta_index", value=0.0, **param_kwargs),
        Param(name="energy_pivot", value=25 * ureg.GeV, **param_kwargs),
    ]
    return mceq_barr(
        table_file=(
            "flux/MCEq_flux_gradient_splines_2212_GlobalSplineFitBeta"
            "_SIBYLL23C.pckl.bz2"
        ),
        include_nutau_flux=False,
        use_honda_nominal_flux=True,
        params=ParamSet(params),
    )
