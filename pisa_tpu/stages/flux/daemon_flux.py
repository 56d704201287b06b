"""
DAEMONFLUX atmospheric flux (cf. reference
``pisa/stages/flux/daemon_flux.py``): the calibrated data-driven flux with
24 correlated ``daemon_*`` calibration parameters (meson-production yields
+ GSF primary-flux parameters) and a ``daemon_chi2`` covariance penalty
(reference ``param.py:1388`` switches the prior penalty of all daemon
params to that single chi2).

Two execution paths:

- the external ``daemonflux`` package, when importable, provides the
  calibrated tables and exact parameter responses (eager evaluation — the
  package is host-side numpy);
- otherwise (and inside compiled templates, where the flux must be
  TRACEABLE) the native analytic stand-in
  (:mod:`pisa_tpu.utils.daemonflux_native`) evaluates a precomputed base
  flux times linear parameter responses — same machinery, differentiable
  end-to-end, so daemon parameters get analytic gradients in compiled
  fits (the reference cannot differentiate through the package at all).

Correlated penalty: the default correlation matrix is the VENDORED
``resources/flux/daemonflux_correlations.json``, built from the exact
diagonal of the calibrated inverse-correlation matrix that the reference
repo publishes (its executed ``test_daemonflux_stage.ipynb`` prints the
mod_chi2 penalty of every single-parameter +1 sigma pull, and for a
one-hot pull ``chi2 = (C^-1)_{ii}``), completed off-diagonal with a
single-factor model (``scripts/make_daemonflux_correlations.py``).
Deviation bounds: one-hot pulls reproduce the reference's published
penalties to <1e-9 relative; multi-parameter pulls use the factor-model
off-diagonals (positive common-factor correlations with the exact
published multiple correlations 0.37-0.9995), which is the maximum the
public record pins down — the unpublished pairwise daemonflux
covariances may differ in sign structure. Pass
``correlations_file='identity'`` for the uncorrelated Sum v_i^2 penalty.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pisa_tpu import FTYPE, ureg
from pisa_tpu.core.param import Param, ParamSelector, ParamSet
from pisa_tpu.core.stage import Stage
from pisa_tpu.utils.daemonflux_native import (
    DAEMON_PARAM_NAMES,
    NativeDaemonFlux,
)
from pisa_tpu.utils.log import logging

__all__ = ["daemon_flux", "init_test"]


class daemon_flux(Stage):  # noqa: N801
    """Params: 24 ``daemon_*`` (sigma units) + ``daemon_chi2`` (output) +
    ``daemon_params_len`` (guard, cf. reference ``pipeline.py:125``)."""

    # events-calc stacked support: base flux and log10(E) are per-event
    # container keys (stacked to (C, n_pad, ...)), the response math is
    # shape-agnostic jnp with a per-category nubar sign
    supports_stacked = True

    # writes nu_flux only; never touches event weights (rate deferral safe)
    stacked_rate_defer_safe = True

    #: default vendored correlation matrix (diag(C^-1) pinned to the
    #: reference's published single-pull penalties; see module docstring)
    VENDORED_CORRELATIONS = "flux/daemonflux_correlations.json"

    def __init__(self, correlations_file=VENDORED_CORRELATIONS,
                 calibration_file=None, **std_kwargs):
        if correlations_file == "identity":
            correlations_file = None
        self.cal_file = calibration_file
        self.flux_obj = None  # real daemonflux.Flux when importable
        try:
            from daemonflux import Flux

            self.flux_obj = Flux(
                location="IceCube", use_calibration=True,
                cal_file=calibration_file,
            )
            raw_names = list(self.flux_obj.params.known_parameters)
            self.daemon_names = raw_names
            pisa_tags = [
                p.replace("pi+", "pi").replace("pi-", "antipi")
                .replace("K+", "K").replace("K-", "antiK")
                for p in raw_names
            ]
        except ImportError:
            self.daemon_names = list(DAEMON_PARAM_NAMES)
            pisa_tags = list(DAEMON_PARAM_NAMES)
            logging.warning(
                "daemonflux package not installed: flux.daemon_flux runs"
                " the NATIVE analytic stand-in"
                " (pisa_tpu/utils/daemonflux_native.py) — same machinery,"
                " approximate response shapes; install daemonflux for"
                " calibrated physics"
            )
        self.native = NativeDaemonFlux(correlations=correlations_file)
        self.daemon_params = ["daemon_" + t for t in pisa_tags]

        # internal parity params (cf. reference daemon_flux.py:188-207):
        # daemon_chi2 carries the covariance penalty for the eager
        # ParamSet.priors_penalty switch; daemon_params_len guards against
        # stray 'daemon_'-named params corrupting the penalty bookkeeping
        params = std_kwargs.get("params")
        if isinstance(params, (ParamSet, ParamSelector)):
            params.update(
                Param(
                    name="daemon_chi2", value=0.0 * ureg.dimensionless,
                    prior=None, range=None, is_fixed=True,
                ),
                existing_must_match=False,
            )
            params.update(
                Param(
                    name="daemon_params_len",
                    value=float(len(self.daemon_params) + 2)
                    * ureg.dimensionless,
                    prior=None, range=None, is_fixed=True,
                ),
                existing_must_match=False,
            )

        super().__init__(
            expected_params=tuple(
                self.daemon_params + ["daemon_chi2", "daemon_params_len"]
            ),
            expected_container_keys=("true_energy", "true_coszen", "nubar"),
            **std_kwargs,
        )

    # -- setup ---------------------------------------------------------------
    def setup_function(self):
        """Precompute the per-event BASE flux (package at nominal params
        when available, else the Honda 2015 table) and the sanitized
        log10(E) the traced response kernels consume."""
        from pisa_tpu.utils.flux_weights import (
            calculate_2d_flux_weights, load_2d_table,
        )

        honda = None
        for container in self.data:
            e = np.asarray(container["true_energy"], dtype=np.float64)
            cz = np.clip(
                np.asarray(container["true_coszen"], dtype=np.float64),
                -1.0, 1.0,
            )
            sfx = "" if int(container["nubar"]) > 0 else "bar"
            base = np.empty((e.size, 2), dtype=FTYPE)
            if self.flux_obj is not None:
                zero = {n: 0.0 for n in self.daemon_names}
                base[:, 0] = self.flux_obj.flux(
                    e, cz, f"nue{sfx}", params=zero
                ) / e**3
                base[:, 1] = self.flux_obj.flux(
                    e, cz, f"numu{sfx}", params=zero
                ) / e**3
            else:
                if honda is None:
                    honda = load_2d_table("flux/honda-2015-spl-solmin-aa.d")
                base[:, 0] = calculate_2d_flux_weights(
                    e, cz, honda[f"nue{sfx}"]
                )
                base[:, 1] = calculate_2d_flux_weights(
                    e, cz, honda[f"numu{sfx}"]
                )
            container["daemon_base_flux"] = base
            container["daemon_log10e"] = np.log10(
                np.where(np.isfinite(e) & (e > 0), e, 1.0)
            ).astype(FTYPE)

    # -- compute ---------------------------------------------------------------
    def _param_values(self):
        return {
            tag: self.params[pname].value.m_as("dimensionless")
            for tag, pname in zip(
                self.native.param_names
                if self.flux_obj is None
                else self.daemon_names,
                self.daemon_params,
            )
        }

    def compute_function(self):
        values = self._param_values()
        traced = any(
            hasattr(v, "aval") for v in values.values()
        )  # jax tracers carry .aval

        # eager bookkeeping: the covariance chi2 for the reference-parity
        # ParamSet.priors_penalty switch (param.py). Inside a trace the
        # penalty flows through the params' own unit-Gaussian priors
        # (identical for identity correlations; use add_covariance for a
        # correlated matrix).
        if not traced:
            vec = np.asarray(
                [float(values[k]) for k in (
                    self.native.param_names
                    if self.flux_obj is None
                    else self.daemon_names
                )]
            )
            if self.flux_obj is not None:
                chi2 = float(self.flux_obj.chi2(
                    dict(zip(self.daemon_names, vec))
                ))
            else:
                chi2 = float(self.native.chi2(vec))
            self.params["daemon_chi2"]._value = (
                chi2 * ureg.dimensionless
            )

        exact = self.flux_obj is not None and not traced
        for container in self.data:
            if getattr(container, "is_stacked", False):
                sign = np.asarray(
                    container.cat_aux("nubar"), dtype=float
                )[:, None]
                base = jnp.asarray(container["daemon_base_flux"])
                log10e = jnp.asarray(container["daemon_log10e"])
                mod_e, mod_mu = self.native.modification(
                    log10e, jnp.asarray(sign, dtype=log10e.dtype), values
                )
                container["nu_flux"] = base * jnp.stack(
                    [mod_e, mod_mu], axis=-1
                )
                continue
            nubar = int(container["nubar"])
            if exact:
                e = np.asarray(container["true_energy"], dtype=np.float64)
                cz = np.clip(
                    np.asarray(
                        container["true_coszen"], dtype=np.float64
                    ), -1.0, 1.0,
                )
                sfx = "" if nubar > 0 else "bar"
                pd = dict(zip(self.daemon_names,
                              [float(values[k]) for k in
                               self.daemon_names]))
                flux = np.empty((e.size, 2), dtype=FTYPE)
                flux[:, 0] = self.flux_obj.flux(
                    e, cz, f"nue{sfx}", params=pd
                ) / e**3
                flux[:, 1] = self.flux_obj.flux(
                    e, cz, f"numu{sfx}", params=pd
                ) / e**3
                container["nu_flux"] = flux
            else:
                base = jnp.asarray(container["daemon_base_flux"])
                log10e = jnp.asarray(container["daemon_log10e"])
                mod_e, mod_mu = self.native.modification(
                    log10e, nubar, values
                )
                container["nu_flux"] = base * jnp.stack(
                    [mod_e, mod_mu], axis=-1
                )
            container.mark_changed("nu_flux")


def init_test(**param_kwargs):
    """Instantiation example (native fallback; no external dependency)."""
    params = [
        Param(
            name=f"daemon_{tag}", value=0.0 * ureg.dimensionless,
            **param_kwargs,
        )
        for tag in DAEMON_PARAM_NAMES
    ]
    return daemon_flux(params=ParamSet(params), calc_mode="events")
