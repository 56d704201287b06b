"""
Barr-2006 parameterized atmospheric-flux modifications, vectorized JAX.

Rebuild of reference ``pisa/utils/barr_parameterization.py`` (numba device
functions, originally by J.P. Yanez / oscfit) as branch-free jnp functions.
`flav` (0=e, 1=mu) is a static python int, so each flavor specializes at
trace time — matching the reference's per-call constants.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "mod_flux",
    "mod_ratio_uphor",
    "mod_ratio_nubar",
    "spectral_index_scale",
    "nubar_mod_field",
    "mod_ratio_nubar_from_field",
    "mod_ratio_nubar_from_field_signed",
    "uphor_mod_field",
    "mod_ratio_uphor_from_field",
    "spectral_index_scale_from_log",
]


def _sign(val):
    return jnp.sign(val)


def _log_log_param(true_energy, y1, y2, x1, x2, cutoff_value=None):
    """Power-law interpolation in log-log space between (x1, y1), (x2, y2)
    (cf. reference ``LogLogParam``, ``barr_parameterization.py:27``)."""
    nu_nubar = jnp.sign(y2)
    y1_ = jnp.sign(y1) * jnp.log10(jnp.abs(y1) + 0.0001)
    y2_ = jnp.log10(jnp.abs(y2 + 0.0001))
    modification = nu_nubar * jnp.power(
        10.0,
        ((y2_ - y1_) / (x2 - x1)) * (jnp.log10(true_energy) - x1) + y1_ - 2.0,
    )
    if cutoff_value is not None:
        modification = modification * jnp.exp(-true_energy / cutoff_value)
    return modification


def _norm_fcn(x, amplitude, sigma):
    return (
        amplitude
        / jnp.sqrt(2 * jnp.pi * sigma**2)
        * jnp.exp(-(x**2) / (2 * sigma**2))
    )


# fit constants (Barr 2006 figs. 7 & 9; cf. reference ModFlux)
_E1MAX_MU, _E2MAX_MU = 3.0, 43.0
_E1MAX_E, _E2MAX_E = 2.5, 10.0
_X1E, _X2E = 0.5, 3.0
_Z1MAX_MU, _Z2MAX_MU = 0.6, 5.0
_Z1MAX_E, _Z2MAX_E = 0.3, 5.0
_NUE_CUTOFF, _NUMU_CUTOFF = 650.0, 1000.0
_X1Z, _X2Z = 0.5, 2.0


def mod_flux(flav, true_energy, true_coszen, e1mu, e2mu, z1mu, z2mu, e1e, e2e, z1e, z2e):
    """Barr flux modification for flavor `flav` (0=e, 1=mu static int)
    (cf. reference ``ModFlux``, ``barr_parameterization.py:43``)."""
    if flav == 1:
        a_ave = _log_log_param(
            true_energy, _E1MAX_MU * e1mu, _E2MAX_MU * e2mu, _X1E, _X2E
        )
        a_shape = 2.5 * _log_log_param(
            true_energy,
            _Z1MAX_MU * z1mu,
            _Z2MAX_MU * z2mu,
            _X1Z,
            _X2Z,
            cutoff_value=_NUMU_CUTOFF,
        )
        return a_ave - (_norm_fcn(true_coszen, a_shape, 0.36) - 0.6 * a_shape)
    if flav == 0:
        a_ave = _log_log_param(
            true_energy,
            _E1MAX_MU * e1mu + _E1MAX_E * e1e,
            _E2MAX_MU * e2mu + _E2MAX_E * e2e,
            _X1E,
            _X2E,
        )
        a_shape = 1.0 * _log_log_param(
            true_energy,
            _Z1MAX_MU * z1mu + _Z1MAX_E * z1e,
            _Z2MAX_MU * z2mu + _Z2MAX_E * z2e,
            _X1Z,
            _X2Z,
            cutoff_value=_NUE_CUTOFF,
        )
        return a_ave - (
            1.5 * _norm_fcn(true_coszen, a_shape, 0.36) - 0.7 * a_shape
        )
    raise ValueError(f"flav must be 0 or 1; got {flav}")


def mod_ratio_uphor(flav, true_energy, true_coszen, uphor):
    """Up/horizontal ratio modification (cf. reference ``modRatioUpHor``)."""
    if flav == 0:
        a_shape = jnp.abs(uphor) * _log_log_param(
            true_energy,
            _Z1MAX_E + _Z1MAX_MU,
            _Z2MAX_E + _Z2MAX_MU,
            _X1Z,
            _X2Z,
            cutoff_value=_NUE_CUTOFF,
        )
        return 1.0 - 0.3 * jnp.sign(uphor) * _norm_fcn(
            true_coszen, a_shape, 0.35
        )
    if flav == 1:
        return jnp.ones_like(true_energy)
    raise ValueError(f"flav must be 0 or 1; got {flav}")


def mod_ratio_nubar(nubar, flav, true_energy, true_coszen, nubar_sys):
    """nu/nubar ratio modification; `nubar` static +-1
    (cf. reference ``modRatioNuBar``)."""
    modfactor = nubar_sys * mod_flux(
        flav, true_energy, true_coszen, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0
    )
    if nubar < 0:
        return jnp.maximum(0.0, 1.0 / (1.0 + 0.5 * modfactor))
    return jnp.maximum(0.0, 1.0 + 0.5 * modfactor)


# -- factored (precomputable) forms -------------------------------------------
#
# The Barr modifications are built from transcendental fields of (E, coszen)
# whose PARAMETERS enter only linearly or as simple outer factors:
#
# - ``mod_ratio_nubar`` calls ``mod_flux`` with ALL unit coefficients, so its
#   field M_flav(E, cz) is parameter-free: mod = max(0, 1 +- 0.5*sys*M).
# - ``mod_ratio_uphor`` (flav 0): the Gaussian ``_norm_fcn(x, A, s)`` is
#   LINEAR in its amplitude A = |uphor|*L(E), so
#   mod = 1 - 0.3*sign(u)*_norm_fcn(cz, |u|*L, .35) = 1 - 0.3*u*L(E)*N(cz).
#
# When the sample coordinates are fixed (a calc grid, or any event set), the
# fields can be evaluated ONCE concretely and the per-template math reduces
# to a few rational ops — removing all log10/pow/exp traffic (and its
# reverse-mode twin) from compiled templates. Exactness: the factored forms
# are the same expressions reassociated, equal to the direct path up to one
# rounding.


def nubar_mod_field(flav, true_energy, true_coszen):
    """Parameter-free field M_flav of :func:`mod_ratio_nubar`."""
    return mod_flux(
        flav, true_energy, true_coszen, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0
    )


def mod_ratio_nubar_from_field(nubar, field, nubar_sys):
    """:func:`mod_ratio_nubar` from a precomputed :func:`nubar_mod_field`."""
    modfactor = nubar_sys * field
    if nubar < 0:
        return jnp.maximum(0.0, 1.0 / (1.0 + 0.5 * modfactor))
    return jnp.maximum(0.0, 1.0 + 0.5 * modfactor)


def mod_ratio_nubar_from_field_signed(sign, field, nubar_sys):
    """:func:`mod_ratio_nubar_from_field` with an ARRAY nubar sign (one
    +-1 per stacked category row, broadcast against the field); used by the
    category-stacked events-mode flux path where the sign varies along the
    leading axis instead of being a static per-container constant."""
    modfactor = nubar_sys * field
    plus = jnp.maximum(0.0, 1.0 + 0.5 * modfactor)
    minus = jnp.maximum(0.0, 1.0 / (1.0 + 0.5 * modfactor))
    return jnp.where(sign < 0, minus, plus)


def uphor_mod_field(flav, true_energy, true_coszen):
    """Parameter-free field P_flav with
    ``mod_ratio_uphor == 1 - 0.3 * uphor * P`` (P = 0 for flav=1)."""
    if flav == 1:
        return jnp.zeros_like(true_energy)
    if flav != 0:
        raise ValueError(f"flav must be 0 or 1; got {flav}")
    amp = _log_log_param(
        true_energy,
        _Z1MAX_E + _Z1MAX_MU,
        _Z2MAX_E + _Z2MAX_MU,
        _X1Z,
        _X2Z,
        cutoff_value=_NUE_CUTOFF,
    )
    return amp * _norm_fcn(true_coszen, 1.0, 0.35)


def mod_ratio_uphor_from_field(field, uphor):
    """:func:`mod_ratio_uphor` from a precomputed :func:`uphor_mod_field`."""
    return 1.0 - 0.3 * uphor * field


def spectral_index_scale(true_energy, egy_pivot, delta_index):
    """(E / E_pivot)^delta_index."""
    return jnp.power(true_energy / egy_pivot, delta_index)


def spectral_index_scale_from_log(log_e_over_pivot, delta_index):
    """:func:`spectral_index_scale` from a precomputed ``log(E/pivot)``
    (pow lowers to exp(d*log x); precomputing the log halves the
    transcendental count per template)."""
    return jnp.exp(delta_index * log_e_over_pivot)
