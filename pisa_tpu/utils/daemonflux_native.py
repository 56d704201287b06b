"""
Native (JAX-traceable) fallback for the daemonflux atmospheric-flux
parameterization (Fedynitch, Huber et al.; the reference stage
``pisa/stages/flux/daemon_flux.py`` wraps the external ``daemonflux``
package and is a REQUIRED dependency there).

daemonflux is data (calibrated flux tables + parameter covariance) plus a
LINEAR response of the flux to 24 calibration parameters (meson-production
yields at fixed-target beam energies and six GSF primary-flux parameters),
with a correlated chi2 penalty. When the package is unavailable, this
module supplies the same machinery with an analytic response model:

- base flux: the vendored Honda 2015 azimuth-averaged table
  (integral-preserving interpolation, :mod:`pisa_tpu.utils.flux_weights`) —
  the same base-flux family daemonflux calibrates against;
- parameter responses: each ``daemon_*`` parameter perturbs the flux
  multiplicatively with a log-normal energy kernel centered at the
  parameter's characteristic NEUTRINO energy (E_nu ~ E_beam/10 for meson
  yields; the GSF band center / 20 for primary-flux parameters), carrying
  the hadronic structure: ``pi_*`` act on the pion component (dominant at
  low energy), ``K_*`` on the kaon component (weight growing with energy),
  ``anti*`` variants act on the antineutrino channels, ``p/n`` and
  ``GSF_*`` on all channels;
- correlated penalty: ``chi2(v) = v^T C^-1 v`` with C a correlation
  matrix. The VENDORED ``resources/flux/daemonflux_correlations.json``
  (the flux stage's default) reproduces the exact published diagonal of
  the calibrated inverse-correlation matrix — the reference repo's
  executed ``test_daemonflux_stage.ipynb`` prints every single-parameter
  +1 sigma mod_chi2 penalty, which for a one-hot pull IS ``(C^-1)_{ii}``
  — with the off-diagonals completed by a single-factor model
  (``scripts/make_daemonflux_correlations.py``). ``correlations=None``
  falls back to identity (penalty = Sum v_i^2).

The response SHAPES are an analytic stand-in, not the calibrated
daemonflux gradients — install the real package for production physics.
The machinery (parameter vector -> modified flux -> correlated penalty)
is identical either way, and this native path is differentiable
end-to-end inside compiled templates (the wrapped package is host-side
only), so daemon parameters get ANALYTIC gradients here.
"""

from __future__ import annotations

import json

import numpy as np

import jax.numpy as jnp

from pisa_tpu.utils.log import logging

__all__ = [
    "DAEMON_PARAM_NAMES",
    "NativeDaemonFlux",
    "compiled_daemon_penalty",
]

# PISA-config-compatible names (reference daemon_flux.py:180: pi+ -> pi,
# pi- -> antipi, K+ -> K, K- -> antiK), without the 'daemon_' prefix.
DAEMON_PARAM_NAMES = [
    "K_158G", "K_2P", "K_31G",
    "antiK_158G", "antiK_2P", "antiK_31G",
    "n_158G", "n_2P",
    "p_158G", "p_2P",
    "pi_158G", "pi_20T", "pi_2P", "pi_31G",
    "antipi_158G", "antipi_20T", "antipi_2P", "antipi_31G",
    "GSF_1", "GSF_2", "GSF_3", "GSF_4", "GSF_5", "GSF_6",
]

# characteristic beam energies [GeV] per yield tag; neutrino kernel center
# is E_beam / 10 (typical lab-frame energy fraction through meson decay)
_BEAM_E = {"31G": 31.0, "158G": 158.0, "20T": 2e4, "2P": 2e6}
# GSF band centers [GeV primary]; neutrino center is E_primary / 20
_GSF_E = {f"GSF_{i}": 10.0 ** (i + 1) for i in range(1, 7)}

_SIGMA_MESON = 0.02  # 1-sigma fractional flux shift of a yield param
_SIGMA_GSF = 0.015
_WIDTH_MESON = 0.6  # log10 kernel width [dex]
_WIDTH_GSF = 0.5


def _kernel(log10e, center_gev, width):
    return jnp.exp(
        -0.5 * ((log10e - np.log10(center_gev)) / width) ** 2
    )


def _pion_fraction(log10e):
    """Approximate pion share of conventional nu_mu production (kaons take
    over above the pion critical energy)."""
    e = 10.0**log10e
    return 1.0 / (1.0 + e / 300.0)


def compiled_daemon_penalty(free_params, pipelines):
    """Compiled-objective analog of the eager ``ParamSet.priors_penalty``
    daemonflux switch (reference ``param.py:1388-1402``): when a pipeline
    carries a daemon_flux stage, the ``daemon_*`` parameters' penalty is
    ONE correlated chi2 (``v^T C^-1 v``), not their individual priors.

    Parameters
    ----------
    free_params : sequence of Param
        The objective's free parameters, in vector order.
    pipelines : iterable of Pipeline
        Pipelines whose stages are searched for a daemon_flux stage.

    Returns
    -------
    None when no daemon stage / no free daemon params; otherwise
    ``(skip_indices, llh_fn)`` — the free-param indices whose individual
    priors the objective must skip, and a traceable ``llh_fn(mags)``
    mapping the full magnitude list to the joint daemon llh (-chi2/2).
    Fixed daemon parameters contribute their compile-time values as
    constants (matching the eager path, which uses current values).
    """
    stage = None
    for pl in pipelines:
        for s in getattr(pl, "stages", []):
            if isinstance(getattr(s, "native", None), NativeDaemonFlux):
                stage = s
                break
        if stage is not None:
            break
    if stage is None:
        return None
    idx = {p.name: i for i, p in enumerate(free_params)}
    entries = []
    for tag in stage.native.param_names:
        pname = "daemon_" + tag
        if pname in idx:
            entries.append(("free", idx[pname]))
        else:
            prm = stage.params[pname]
            entries.append(
                ("fixed", float(prm.value.m_as("dimensionless")))
            )
    skip = frozenset(i for kind, i in entries if kind == "free")
    if not skip:
        return None
    cinv = np.asarray(stage.native._cinv)

    def llh_fn(mags):
        v = jnp.stack(
            [
                mags[spec] if kind == "free"
                else jnp.asarray(float(spec))
                for kind, spec in entries
            ]
        )
        chi2 = v @ jnp.asarray(cinv, dtype=v.dtype) @ v
        return -0.5 * chi2

    return skip, llh_fn


class NativeDaemonFlux:
    """Analytic daemonflux stand-in: base flux + linear param responses.

    Parameters
    ----------
    correlations : str or None
        Resource path of a JSON correlation matrix for the 24 parameters;
        None -> identity (uncorrelated unit-sigma penalty).
    """

    param_names = list(DAEMON_PARAM_NAMES)

    def __init__(self, correlations=None):
        n = len(self.param_names)
        corr = np.eye(n)
        if correlations is not None:
            from pisa_tpu.utils.resources import find_resource

            with open(find_resource(correlations)) as fh:
                cd = json.load(fh)
            for i, a in enumerate(self.param_names):
                for j, b in enumerate(self.param_names):
                    corr[i, j] = cd.get(a, {}).get(b, 1.0 if i == j else 0.0)
        self._cinv = np.linalg.inv(corr)
        logging.debug(
            "NativeDaemonFlux: %d params, %s correlations",
            n, "identity" if correlations is None else correlations,
        )

    # -- penalty -----------------------------------------------------------
    def chi2(self, values):
        """Correlated chi2 of the (24,) parameter vector (sigma units);
        jnp — traceable and differentiable."""
        v = jnp.asarray(values)
        return v @ jnp.asarray(self._cinv, dtype=v.dtype) @ v

    # -- flux response -------------------------------------------------------
    def modification(self, log10e, nubar, values):
        """Multiplicative flux-modification factors for one (nue, numu)
        channel pair.

        Parameters
        ----------
        log10e : (...,) log10 of the neutrino energy [GeV] (pads sanitized)
        nubar : +1 / -1 (static) or broadcastable array of signs
        values : dict name -> scalar (traced ok), in sigma units

        Returns
        -------
        (mod_e, mod_mu) multiplicative factors, same shape as log10e.
        """
        log10e = jnp.asarray(log10e)
        is_bar = jnp.asarray(nubar) < 0
        f_pi = _pion_fraction(log10e)
        f_k = 1.0 - f_pi

        d_mu = jnp.zeros_like(log10e)
        d_e = jnp.zeros_like(log10e)
        for name in self.param_names:
            v = values[name]
            tag = name.split("_", 1)[-1]
            if name.startswith("GSF"):
                g = _SIGMA_GSF * _kernel(
                    log10e, _GSF_E[name] / 20.0, _WIDTH_GSF
                ) * v
                d_mu = d_mu + g
                d_e = d_e + g
                continue
            center = _BEAM_E[tag] / 10.0
            g = _SIGMA_MESON * _kernel(log10e, center, _WIDTH_MESON) * v
            anti = name.startswith("anti")
            # anti-meson yields drive the antineutrino channels
            sel = jnp.where(is_bar, 1.0 if anti else 0.3,
                            0.3 if anti else 1.0)
            if name.startswith(("pi", "antipi")):
                d_mu = d_mu + g * sel * f_pi
                d_e = d_e + g * sel * f_pi * 0.3  # muon-decay share
            elif name.startswith(("K", "antiK")):
                d_mu = d_mu + g * sel * f_k
                d_e = d_e + g * sel  # K_e3 dominates conventional nu_e
            else:  # p_* / n_* beam-nucleon yields: all channels
                d_mu = d_mu + g
                d_e = d_e + g
        return 1.0 + d_e, 1.0 + d_mu
