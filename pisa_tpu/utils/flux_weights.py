"""
Atmospheric-flux table loading and integral-preserving evaluation.

Rebuild of the reference ``pisa/utils/flux_weights.py`` (``load_2d_honda_table:50``,
``load_2d_bartol_table:133``, ``load_2d_table:205``,
``calculate_2d_flux_weights:267-349``). The reference's scheme (IceCube
NuFlux-style "integral-preserving" interpolation):

1. per coszen band of the table, spline the *cumulative* flux integral over
   log10(energy) (knot grid offset half a table step); the flux at an energy
   is the spline's first derivative there;
2. per evaluation point, integrate those per-band derivatives cumulatively
   over coszen, spline the 21-knot cumulative, and take the derivative at
   the point's coszen.

The reference evaluates this in a per-event python loop building one scipy
spline per event (``calculate_2d_flux_weights:335-349``). Here both steps
are vectorized over all events: scipy ``CubicSpline`` objects hold the
per-band cumulative integrals with a 2-D y (bands on the second axis), the
per-event coszen spline is solved for all events at once (CubicSpline with
the event axis as extra dimension), and its derivative is evaluated at each
event's own coszen via gathered polynomial coefficients. scipy's FITPACK
interpolating spline (``splrep(s=0)``, what the reference uses) and
``CubicSpline(bc_type='not-a-knot')`` are the same cubic interpolant, so
results match the reference to floating-point round-off (validated in
``tests/test_flux_weights.py`` against a direct loop transcription of the
reference algorithm).

The nominal flux has no free (traced) parameters, so this evaluation is
host-side numpy/scipy, run once per setup/compute of ``flux.honda_ip``;
the resulting per-event flux arrays enter compiled templates as constants.
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import CubicSpline

from pisa_tpu.utils.resources import find_resource

__all__ = [
    "load_2d_honda_table",
    "load_2d_bartol_table",
    "load_2d_table",
    "calculate_2d_flux_weights",
]

PRIMARIES = ["numu", "numubar", "nue", "nuebar"]


class FluxTable2D:
    """Integral-preserving 2-D (energy x coszen) flux table.

    Attributes
    ----------
    splines : dict primary -> CubicSpline over log10(E) whose y has shape
        (n_knots, n_cz_bands): cumulative flux integral per coszen band.
    cz_spline_points : (n_cz_bands + 1,) coszen knots for the second pass.
    name : 'honda' or 'bartol'
    """

    def __init__(self, splines, cz_spline_points, name):
        self.splines = splines
        self.cz_spline_points = np.asarray(cz_spline_points)
        self.name = name

    def __getitem__(self, primary):
        return self.splines[primary]

    def keys(self):
        return self.splines.keys()


def _read_table(flux_file):
    """Parse a Honda-format azimuth-averaged table: text header lines per
    coszen block, columns (energy, numu, numubar, nue, nuebar)."""
    table = np.genfromtxt(find_resource(flux_file), usecols=range(5))
    mask = np.all(np.isnan(table) | np.equal(table, 0), axis=1)
    table = table[~mask].T
    flux = dict(zip(["energy"] + PRIMARIES, table))
    for key in flux:
        # 20 coszen blocks, ordered cz = [0.95 ... -0.95] in the file
        flux[key] = np.array(np.split(flux[key], 20))
    flux["energy"] = flux["energy"][0]
    return flux


def _build(flux, logenergy_knots, de_steps, name):
    """Cumulative-integral splines per primary; bands ascending in coszen."""
    splines = {}
    for prim in PRIMARIES:
        # file blocks are cz-descending; czkeys ascend -0.95..0.95
        bands = flux[prim][::-1]  # (20, n_E), ascending coszen
        # cumulative integral of flux*E over the table grid, 0 prepended
        cum = np.concatenate(
            [
                np.zeros((bands.shape[0], 1)),
                np.cumsum(bands * flux["energy"] * de_steps, axis=1),
            ],
            axis=1,
        )  # (20, n_knots)
        splines[prim] = CubicSpline(
            logenergy_knots, cum.T, axis=0, bc_type="not-a-knot"
        )
    return FluxTable2D(splines, np.linspace(-1, 1, 21), name)


def load_2d_honda_table(flux_file, enpow=1):
    """Honda 2015 azimuth-averaged table -> integral-preserving splines
    (cf. reference ``flux_weights.py:50-131``)."""
    flux = _read_table(flux_file)
    if enpow != 1:
        raise NotImplementedError("enpow != 1")
    # 101 energies at 0.05 log10 steps; cumulative knots offset half a step
    logenergy_knots = np.linspace(-1.025, 4.025, 102)
    return _build(flux, logenergy_knots, 0.05, "honda")


def load_2d_bartol_table(flux_file, enpow=1):
    """Bartol 2004 table (Honda-ified format; cf. reference
    ``flux_weights.py:133-203``): 0.05 log steps below 10 GeV, 0.1 above."""
    flux = _read_table(flux_file)
    if enpow != 1:
        raise NotImplementedError("enpow != 1")
    steps = np.where(flux["energy"] < 10.0, 0.05, 0.1)
    logenergy_knots = np.concatenate(
        [np.linspace(-1, 1, 41), np.linspace(1.1, 4, 30)]
    )
    return _build(flux, logenergy_knots, steps, "bartol")


def load_2d_table(flux_file, enpow=1):
    """Dispatch by table family (cf. reference ``flux_weights.py:205``)."""
    if "aa" not in flux_file:
        raise ValueError("Azimuth-averaged tables are expected")
    if "honda" in flux_file:
        return load_2d_honda_table(flux_file, enpow=enpow)
    if "bartol" in flux_file:
        return load_2d_bartol_table(flux_file, enpow=enpow)
    raise ValueError("Flux file must be from the Honda or Bartol groups")


def calculate_2d_flux_weights(
    true_energies, true_coszens, en_splines, enpow=1, out=None
):
    """Integral-preserving flux per (energy, coszen) point, vectorized
    (cf. reference ``flux_weights.py:267-349``).

    Parameters
    ----------
    true_energies, true_coszens : (N,) arrays (energies in GeV)
    en_splines : CubicSpline from a loaded table (one primary)
    """
    true_energies = np.asarray(true_energies, dtype=np.float64)
    true_coszens = np.asarray(true_coszens, dtype=np.float64)
    if true_energies.shape != true_coszens.shape:
        raise ValueError("length of energy and coszen arrays must match")
    if not ((true_coszens >= -1.0).all() and (true_coszens <= 1.0).all()):
        raise ValueError("Not all coszens found between -1 and 1")
    if enpow != 1:
        raise NotImplementedError("enpow != 1")

    log_e = np.log10(true_energies)
    # step 1: d(cumulative)/d(logE) at every event, all cz bands at once
    d = en_splines.derivative(1)(log_e)  # (N, 20)
    n_cz = d.shape[-1]
    # step 2: cumulative over coszen (knot spacing 0.1), 0 prepended
    int_vals = np.concatenate(
        [np.zeros(log_e.shape + (1,)), np.cumsum(d, axis=-1) * 0.1], axis=-1
    )  # (N, 21)
    cz_points = np.linspace(-1, 1, n_cz + 1)
    cz_spline = CubicSpline(
        cz_points, int_vals.T, axis=0, bc_type="not-a-knot"
    )
    # derivative of each event's own spline at its own coszen: gather the
    # polynomial piece per event and evaluate d/dx of the cubic
    c = cz_spline.c  # (4, n_cz, N)
    k = np.clip(
        np.searchsorted(cz_points, true_coszens, side="right") - 1,
        0,
        n_cz - 1,
    )
    t = true_coszens - cz_points[k]
    idx = np.arange(true_coszens.size)
    kf = k.ravel()
    c0 = c[0].reshape(n_cz, -1)[kf, idx]
    c1 = c[1].reshape(n_cz, -1)[kf, idx]
    c2 = c[2].reshape(n_cz, -1)[kf, idx]
    tf = t.ravel()
    deriv = (3.0 * c0 * tf + 2.0 * c1) * tf + c2
    result = (deriv / true_energies.ravel()).reshape(true_energies.shape)
    if out is not None:
        out[...] = result
        return out
    return result
